"""RetinaNet: head towers, focal-loss training, single-stage inference.

Reference: maskrcnn_benchmark/modeling/rpn/retinanet/
  {retinanet.py:13-148, loss.py:19-106, inference.py:14-193}.

The focal loss is closed-form jnp (XLA fuses it; the reference needed
fwd+bwd CUDA kernels). Inference candidates are fixed-shape: per-level
top-k above threshold, concatenated, per-class NMS via the class-offset
trick, top DETECTIONS_PER_IMG.
"""

import jax
import jax.numpy as jnp

from ..ops.box_ops import box_iou, clip_boxes_to_image, decode_boxes, encode_boxes, small_box_mask
from ..ops.losses import sigmoid_focal_loss, smooth_l1_loss
from ..ops.matcher import match_proposals
from ..ops.sampler import top_k_fast
from ..ops.nms import NEG_INF, batched_nms
from .layers import conv2d, init_conv, relu

import math


def init_retinanet_head(key, cfg, in_channels):
    num_classes = cfg.MODEL.RETINANET.NUM_CLASSES - 1
    num_anchors = len(cfg.MODEL.RETINANET.ASPECT_RATIOS) * cfg.MODEL.RETINANET.SCALES_PER_OCTAVE
    num_convs = cfg.MODEL.RETINANET.NUM_CONVS
    keys = jax.random.split(key, 2 * num_convs + 2)
    cls_tower, bbox_tower = [], []
    for i in range(num_convs):
        cls_tower.append(
            init_conv(keys[2 * i], 3, 3, in_channels, in_channels, init="normal", std=0.01)
        )
        bbox_tower.append(
            init_conv(keys[2 * i + 1], 3, 3, in_channels, in_channels, init="normal", std=0.01)
        )
    cls_logits = init_conv(
        keys[-2], 3, 3, in_channels, num_anchors * num_classes, init="normal", std=0.01
    )
    # prior-probability bias init (retinanet.py:64-68)
    prior = cfg.MODEL.RETINANET.PRIOR_PROB
    bias_value = -math.log((1 - prior) / prior)
    cls_logits["b"] = jnp.full_like(cls_logits["b"], bias_value)
    bbox_pred = init_conv(
        keys[-1], 3, 3, in_channels, num_anchors * 4, init="normal", std=0.01
    )
    return {
        "cls_tower": cls_tower,
        "bbox_tower": bbox_tower,
        "cls_logits": cls_logits,
        "bbox_pred": bbox_pred,
    }


def apply_retinanet_head(params, features, compute_dtype=jnp.bfloat16):
    logits, bbox_reg = [], []
    for f in features:
        c = f
        for p in params["cls_tower"]:
            c = relu(conv2d(c, p, padding=1, compute_dtype=compute_dtype))
        logits.append(conv2d(c, params["cls_logits"], padding=1, compute_dtype=compute_dtype))
        b = f
        for p in params["bbox_tower"]:
            b = relu(conv2d(b, p, padding=1, compute_dtype=compute_dtype))
        bbox_reg.append(conv2d(b, params["bbox_pred"], padding=1, compute_dtype=compute_dtype))
    return logits, bbox_reg


def retinanet_loss(
    anchors,  # [N, 4] concatenated over levels
    box_cls,  # [B, N, C-1] logits (level-concatenated, anchor-major)
    box_reg,  # [B, N, 4]
    gt_boxes,  # [B, G, 4]
    gt_labels,  # [B, G]
    rcfg,
):
    """Returns (cls_loss, reg_loss) with reference normalization:
    cls = sum focal / (num_pos + num_images); reg = sum smooth_l1(pos) /
    max(1, num_pos * BBOX_REG_WEIGHT)."""
    b = box_cls.shape[0]

    def per_image(gt_b, gt_l):
        gt_v = gt_l > 0
        iou = box_iou(gt_b, anchors)
        matched = match_proposals(
            iou, gt_v, rcfg["fg_iou"], rcfg["bg_iou"], allow_low_quality_matches=True
        )
        labels = jnp.where(
            matched >= 0,
            gt_l[jnp.maximum(matched, 0)],
            jnp.where(matched == -1, 0, -1),
        )
        reg_targets = encode_boxes(gt_b[jnp.maximum(matched, 0)], anchors)
        return labels, reg_targets

    labels, reg_targets = jax.vmap(per_image)(gt_boxes, gt_labels)
    pos = labels > 0
    num_pos = jnp.sum(pos)

    fl = sigmoid_focal_loss(
        box_cls.astype(jnp.float32), labels, rcfg["gamma"], rcfg["alpha"]
    )
    cls_loss = jnp.sum(fl) / (num_pos + b)

    l1 = smooth_l1_loss(box_reg.astype(jnp.float32), reg_targets, beta=rcfg["reg_beta"])
    reg_loss = jnp.sum(l1 * pos[..., None]) / jnp.maximum(
        1.0, num_pos * rcfg["reg_weight"]
    )
    return cls_loss, reg_loss


def retinanet_inference(
    anchors_per_level,  # list [Nl, 4]
    box_cls_per_level,  # list [B, Hl, Wl, A*(C-1)]
    box_reg_per_level,  # list [B, Hl, Wl, A*4]
    image_sizes,  # [B, 2]
    rcfg,
):
    """Fixed-shape version of retinanet/inference.py:59-174. Returns padded
    detections dict (boxes, scores, labels, valid) [B, D, ...]."""
    num_classes = rcfg["num_classes"] - 1
    pre_nms = rcfg["pre_nms_top_n"]
    cand_boxes, cand_scores, cand_labels, cand_valid = [], [], [], []
    b = box_cls_per_level[0].shape[0]

    for anchors, cls, reg in zip(anchors_per_level, box_cls_per_level, box_reg_per_level):
        n = anchors.shape[0]
        scores = jax.nn.sigmoid(
            cls.astype(jnp.float32).reshape(b, -1, num_classes)
        ).reshape(b, -1)  # [B, N*(C-1)] anchor-major
        over = scores > rcfg["inference_th"]
        k = min(pre_nms, scores.shape[1])
        masked = jnp.where(over, scores, NEG_INF)
        # [B, N*(C-1)] is ~12M elements at the finest level — the exact-value
        # approx_max_k path matters most here
        top_scores, top_idx = top_k_fast(masked, k)
        valid = top_scores > NEG_INF / 2
        anchor_idx = top_idx // num_classes
        label = (top_idx % num_classes) + 1
        deltas = jnp.take_along_axis(
            reg.astype(jnp.float32).reshape(b, n, 4), anchor_idx[..., None], axis=1
        )
        a = anchors[anchor_idx]
        boxes = decode_boxes(deltas, a, weights=(10.0, 10.0, 5.0, 5.0))
        h = image_sizes[:, 0:1].astype(jnp.float32)
        w = image_sizes[:, 1:2].astype(jnp.float32)
        boxes = clip_boxes_to_image(boxes, (h, w))
        valid = valid & small_box_mask(boxes, rcfg["min_size"])
        cand_boxes.append(boxes)
        cand_scores.append(jnp.where(valid, top_scores, 0.0))
        cand_labels.append(label)
        cand_valid.append(valid)

    boxes = jnp.concatenate(cand_boxes, axis=1)
    scores = jnp.concatenate(cand_scores, axis=1)
    labels = jnp.concatenate(cand_labels, axis=1)
    valid = jnp.concatenate(cand_valid, axis=1)

    # per-class NMS via the class-offset trick, batched over images; the
    # candidate set is prefiltered to the top-k scores per image to bound
    # the sequential NMS work.
    b_, n_tot = scores.shape
    k_nms = min(n_tot, 1000)
    masked = jnp.where(valid, scores, NEG_INF)
    top_sc, top_ix = jax.lax.top_k(masked, k_nms)
    top_bx = jnp.take_along_axis(boxes, top_ix[..., None], axis=1)
    top_lb = jnp.take_along_axis(labels, top_ix, axis=1)
    top_vl = top_sc > NEG_INF / 2
    max_coord = 1e4
    offset_boxes = top_bx + (
        top_lb.astype(top_bx.dtype)[..., None] * (max_coord + 1.0)
    )
    keep = batched_nms(offset_boxes, top_sc, top_vl, rcfg["nms_th"])
    kept = jnp.where(keep, top_sc, NEG_INF)
    out_scores, idx = jax.lax.top_k(kept, rcfg["detections_per_img"])
    out_valid = out_scores > NEG_INF / 2
    ob = jnp.where(
        out_valid[..., None], jnp.take_along_axis(top_bx, idx[..., None], axis=1), 0.0
    )
    olb = jnp.where(
        out_valid, jnp.take_along_axis(top_lb, idx, axis=1), 0
    ).astype(jnp.int32)
    osc = jnp.where(out_valid, out_scores, 0.0)
    return dict(boxes=ob, scores=osc, labels=olb, valid=out_valid)


def make_retinanet_cfg(cfg):
    c = cfg.MODEL.RETINANET
    return dict(
        num_classes=c.NUM_CLASSES,
        fg_iou=c.FG_IOU_THRESHOLD,
        bg_iou=c.BG_IOU_THRESHOLD,
        gamma=c.LOSS_GAMMA,
        alpha=c.LOSS_ALPHA,
        reg_beta=c.BBOX_REG_BETA,
        reg_weight=c.BBOX_REG_WEIGHT,
        pre_nms_top_n=c.PRE_NMS_TOP_N,
        inference_th=c.INFERENCE_TH,
        nms_th=c.NMS_TH,
        detections_per_img=cfg.TEST.DETECTIONS_PER_IMG,
        min_size=0,
    )
