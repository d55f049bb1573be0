"""Region Proposal Network: head, fixed-shape proposal selection, loss.

Reference: maskrcnn_benchmark/modeling/rpn/{rpn.py, inference.py, loss.py}.
TPU redesign highlights (SURVEY.md §7):
  * the per-image python loops and dynamic BoxList surgery of
    rpn/inference.py:76-181 become batched padded tensors + validity masks
  * per-level NMS runs vmapped over (batch x level) lanes so the sequential
    greedy scan is shared across all lanes
  * FPN_POST_NMS top-k per *batch* during training (the Detectron quirk,
    inference.py:154-170) is a global top-k over the flattened batch with a
    rank mask, keeping per-image padded shape
  * balanced 256@0.5 sampling becomes random-priority top-k masks
"""

import jax
import jax.numpy as jnp

from ..ops.box_ops import clip_boxes_to_image, decode_boxes, encode_boxes, small_box_mask
from ..ops.losses import binary_cross_entropy_with_logits, smooth_l1_loss
from ..ops.matcher import match_anchors_streaming
from ..ops.nms import NEG_INF, batched_nms
from ..ops.sampler import sample_topk_indices, top_k_fast
from .layers import conv2d, init_conv, relu


# -- head ---------------------------------------------------------------------


def init_rpn_head(key, in_channels, num_anchors):
    """Shared 3x3 conv + 1x1 cls/4*reg, all normal(std=0.01) bias 0
    (reference rpn.py:74-97)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv": init_conv(k1, 3, 3, in_channels, in_channels, init="normal", std=0.01),
        "cls_logits": init_conv(k2, 1, 1, in_channels, num_anchors, init="normal", std=0.01),
        "bbox_pred": init_conv(k3, 1, 1, in_channels, num_anchors * 4, init="normal", std=0.01),
    }


def apply_rpn_head(params, features, compute_dtype=jnp.bfloat16):
    """Returns (objectness, bbox_reg) lists; objectness [B,H,W,A],
    bbox_reg [B,H,W,4A]. Weights are shared across levels."""
    objectness, bbox_reg = [], []
    for f in features:
        t = relu(conv2d(f, params["conv"], padding=1, compute_dtype=compute_dtype))
        objectness.append(
            conv2d(t, params["cls_logits"], padding=0, compute_dtype=compute_dtype)
        )
        bbox_reg.append(
            conv2d(t, params["bbox_pred"], padding=0, compute_dtype=compute_dtype)
        )
    return objectness, bbox_reg


# -- proposal selection (fixed shapes) --------------------------------------------


def _select_level_proposals(
    anchors,  # [N, 4] all anchors of this level (same for every image)
    objectness,  # [B, N] logits
    bbox_reg,  # [B, N, 4]
    image_sizes,  # [B, 2] (h, w)
    pre_nms_top_n,
    post_nms_top_n,
    nms_thresh,
    min_size,
):
    """One pyramid level for the whole batch.
    Returns (boxes [B, K, 4], scores [B, K] (sigmoid), valid [B, K]),
    K = post_nms_top_n."""
    b, n = objectness.shape
    k_pre = min(pre_nms_top_n, n)

    scores = jax.nn.sigmoid(objectness.astype(jnp.float32))
    top_scores, top_idx = top_k_fast(scores, k_pre)  # [B, k_pre]
    top_deltas = jnp.take_along_axis(
        bbox_reg.astype(jnp.float32), top_idx[..., None], axis=1
    )
    top_anchors = anchors[top_idx]  # [B, k_pre, 4]

    boxes = decode_boxes(top_deltas.reshape(b, k_pre, 4), top_anchors)
    h = image_sizes[:, 0:1].astype(jnp.float32)
    w = image_sizes[:, 1:2].astype(jnp.float32)
    boxes = clip_boxes_to_image(boxes, (h, w))
    valid = small_box_mask(boxes, min_size)

    keep = batched_nms(boxes, top_scores, valid, nms_thresh)
    masked = jnp.where(keep, top_scores, NEG_INF)
    sel_scores, sel = jax.lax.top_k(masked, min(post_nms_top_n, k_pre))
    out_valid = sel_scores > NEG_INF / 2
    out_boxes = jnp.take_along_axis(boxes, sel[..., None], axis=1)
    out_scores = jnp.where(out_valid, sel_scores, 0.0)
    out_boxes = jnp.where(out_valid[..., None], out_boxes, 0.0)
    return out_boxes, out_scores, out_valid


def select_proposals(
    anchors_per_level,  # list of [Nl, 4]
    objectness_per_level,  # list of [B, Hl, Wl, A]
    bbox_reg_per_level,  # list of [B, Hl, Wl, 4A]
    image_sizes,  # [B, 2]
    rpn_cfg,
    is_train,
    gt_boxes=None,  # [B, G, 4] to append in training
    gt_valid=None,  # [B, G]
):
    """Full RPN proposal pipeline. Returns (boxes [B, P, 4], scores [B, P],
    valid [B, P]); P = fpn_post_nms_top_n (+G in training) for FPN or
    post_nms_top_n (+G) for single level."""
    pre_nms = rpn_cfg["pre_nms_top_n_train" if is_train else "pre_nms_top_n_test"]
    post_nms = rpn_cfg["post_nms_top_n_train" if is_train else "post_nms_top_n_test"]
    fpn_post = rpn_cfg["fpn_post_nms_top_n_train" if is_train else "fpn_post_nms_top_n_test"]

    num_levels = len(anchors_per_level)
    all_boxes, all_scores, all_valid = [], [], []
    for lvl in range(num_levels):
        obj = objectness_per_level[lvl]
        b = obj.shape[0]
        a = obj.shape[-1]
        # NCHW reference relayout (rpn/utils.py permute_and_flatten gives
        # (N, HWA, C) ordering: H, W, A) — NHWC already has that order.
        obj = obj.reshape(b, -1)
        reg = bbox_reg_per_level[lvl].reshape(b, -1, a, 4).reshape(b, -1, 4)
        bx, sc, vl = _select_level_proposals(
            anchors_per_level[lvl], obj, reg, image_sizes,
            pre_nms, post_nms, rpn_cfg["nms_thresh"], rpn_cfg["min_size"],
        )
        all_boxes.append(bx)
        all_scores.append(sc)
        all_valid.append(vl)

    boxes = jnp.concatenate(all_boxes, axis=1)
    scores = jnp.concatenate(all_scores, axis=1)
    valid = jnp.concatenate(all_valid, axis=1)

    if num_levels > 1:
        b, n = scores.shape
        k = min(fpn_post, n)
        masked = jnp.where(valid, scores, NEG_INF)
        if is_train and rpn_cfg["fpn_post_nms_per_batch"]:
            # Detectron quirk: top-k over the whole batch during training.
            flat = masked.reshape(-1)
            kth = top_k_fast(flat, min(fpn_post, flat.shape[0]))[0][-1]
            keep = masked >= jnp.maximum(kth, NEG_INF / 2)
            masked = jnp.where(keep, masked, NEG_INF)
        sel_scores, sel = top_k_fast(masked, k)
        sel_valid = sel_scores > NEG_INF / 2
        boxes = jnp.where(
            sel_valid[..., None], jnp.take_along_axis(boxes, sel[..., None], axis=1), 0.0
        )
        scores = jnp.where(sel_valid, sel_scores, 0.0)
        valid = sel_valid

    if is_train and gt_boxes is not None:
        # add_gt_proposals (inference.py:53-74): gt appended with score 1.
        boxes = jnp.concatenate([boxes, gt_boxes.astype(boxes.dtype)], axis=1)
        scores = jnp.concatenate(
            [scores, gt_valid.astype(scores.dtype)], axis=1
        )
        valid = jnp.concatenate([valid, gt_valid], axis=1)
    return boxes, scores, valid


# -- loss --------------------------------------------------------------------------


def rpn_loss(
    anchors,  # [N, 4] all levels concatenated
    anchors_visible,  # [B, N] bool (straddle) — per image
    objectness,  # [B, N] logits (level-concatenated, matching anchors order)
    bbox_reg,  # [B, N, 4]
    gt_boxes,  # [B, G, 4]
    gt_valid,  # [B, G]
    rng,  # PRNG key
    fg_iou,
    bg_iou,
    batch_per_image,
    positive_fraction,
):
    """Reference rpn/loss.py:21-157 with fixed-shape sampling. Returns
    (objectness_loss, box_loss).

    Only the sampled 256 anchors per image contribute to either loss, so
    after matching+sampling everything is gathered down to the fixed [K]
    sample before the gt gather / box encode / loss math — the per-anchor
    [N,4] matched-gt gather alone cost ~12 ms/step at batch 8 on v5e."""
    b = objectness.shape[0]
    keys = jax.random.split(rng, b)

    def per_image(anchors_vis, gt_b, gt_v, obj, reg, key):
        # streaming matcher: the [G, N] IoU table at N~270k anchors is
        # ~100 MB/image; match_anchors_streaming folds it chunk-by-chunk
        matched = match_anchors_streaming(anchors, gt_b, gt_v, fg_iou, bg_iou)
        labels = jnp.where(matched >= 0, 1, jnp.where(matched == -1, 0, -1))
        # discard anchors outside the image (visibility)
        labels = jnp.where(anchors_vis, labels, -1)
        idx, valid, is_pos = sample_topk_indices(
            labels, key, batch_per_image, positive_fraction
        )  # [K]
        m_idx = jnp.maximum(matched[idx], 0)
        reg_t = encode_boxes(gt_b[m_idx], anchors[idx])  # [K, 4]
        return obj[idx], reg[idx], reg_t, valid, is_pos

    obj_s, reg_s, reg_t, valid, is_pos = jax.vmap(per_image)(
        anchors_visible, gt_boxes, gt_valid, objectness, bbox_reg, keys
    )

    n_sampled = jnp.maximum(jnp.sum(valid), 1)

    box_l = smooth_l1_loss(reg_s.astype(jnp.float32), reg_t, beta=1.0 / 9)
    box_loss = jnp.sum(box_l * is_pos[..., None]) / n_sampled

    obj_l = binary_cross_entropy_with_logits(
        obj_s.astype(jnp.float32), is_pos.astype(jnp.float32)
    )
    objectness_loss = jnp.sum(obj_l * valid) / n_sampled
    return objectness_loss, box_loss


def make_rpn_cfg(cfg):
    r = cfg.MODEL.RPN
    return dict(
        pre_nms_top_n_train=r.PRE_NMS_TOP_N_TRAIN,
        pre_nms_top_n_test=r.PRE_NMS_TOP_N_TEST,
        post_nms_top_n_train=r.POST_NMS_TOP_N_TRAIN,
        post_nms_top_n_test=r.POST_NMS_TOP_N_TEST,
        fpn_post_nms_top_n_train=r.FPN_POST_NMS_TOP_N_TRAIN,
        fpn_post_nms_top_n_test=r.FPN_POST_NMS_TOP_N_TEST,
        fpn_post_nms_per_batch=r.FPN_POST_NMS_PER_BATCH,
        nms_thresh=r.NMS_THRESH,
        min_size=r.MIN_SIZE,
        fg_iou=r.FG_IOU_THRESHOLD,
        bg_iou=r.BG_IOU_THRESHOLD,
        batch_per_image=r.BATCH_SIZE_PER_IMAGE,
        positive_fraction=r.POSITIVE_FRACTION,
    )
