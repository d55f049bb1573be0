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
from ..ops.matcher import match_anchors_batched
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
    bbox_reg [B,H,W,4A]. Weights are shared across levels.

    The cls and reg 1x1 convs run as ONE conv on concatenated output
    channels (params stay separate for checkpoint compatibility): with A=3
    both heads pad their 3/12 output channels to a full 128-lane MXU tile
    anyway, so two convs cost two full passes over the [B,H,W,256] trunk
    activation (110 MB at P2) for the price of one — merging halves that
    traffic in the forward AND in the weight-gradient pass."""
    a = params["cls_logits"]["w"].shape[-1]
    merged = {
        "w": jnp.concatenate(
            [params["cls_logits"]["w"], params["bbox_pred"]["w"]], axis=-1
        ),
        "b": jnp.concatenate(
            [params["cls_logits"]["b"], params["bbox_pred"]["b"]]
        ),
    }
    objectness, bbox_reg = [], []
    for f in features:
        t = relu(conv2d(f, params["conv"], padding=1, compute_dtype=compute_dtype))
        o = conv2d(t, merged, padding=0, compute_dtype=compute_dtype)
        objectness.append(o[..., :a])
        bbox_reg.append(o[..., a:])
    return objectness, bbox_reg


# -- proposal selection (fixed shapes) --------------------------------------------


def _level_candidates(
    anchors,  # [N, 4] all anchors of this level (same for every image)
    objectness,  # [B, N] logits
    bbox_reg,  # [B, N, 4]
    image_sizes,  # [B, 2] (h, w)
    pre_nms_top_n,
    min_size,
):
    """Pre-NMS candidates for one pyramid level: top-k by objectness,
    decoded, clipped. Returns (boxes [B, k_pre, 4], scores [B, k_pre],
    valid [B, k_pre])."""
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
    return boxes, top_scores, valid


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
    cand_boxes, cand_scores, cand_valid = [], [], []
    for lvl in range(num_levels):
        obj = objectness_per_level[lvl]
        b = obj.shape[0]
        a = obj.shape[-1]
        # NCHW reference relayout (rpn/utils.py permute_and_flatten gives
        # (N, HWA, C) ordering: H, W, A) — NHWC already has that order.
        obj = obj.reshape(b, -1)
        reg = bbox_reg_per_level[lvl].reshape(b, -1, a, 4).reshape(b, -1, 4)
        bx, sc, vl = _level_candidates(
            anchors_per_level[lvl], obj, reg, image_sizes,
            pre_nms, rpn_cfg["min_size"],
        )
        cand_boxes.append(bx)
        cand_scores.append(sc)
        cand_valid.append(vl)

    # One NMS pass over all (level, image) lanes. The greedy scan is
    # sequential per lane; stacking L levels x B images into [L*B] lanes
    # lets the blocked Pallas kernel sweep them together — at batch 1 this
    # is 5x fewer sequential NMS passes than per-level kernel launches
    # (reference loops levels AND images in python, rpn/inference.py:76-130)
    b = cand_scores[0].shape[0]
    k_max = max(s.shape[1] for s in cand_scores)

    def _pad_to(x, k, fill):
        pad = k - x.shape[1]
        if pad == 0:
            return x
        widths = ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2)
        return jnp.pad(x, widths, constant_values=fill)

    sb = jnp.concatenate([_pad_to(x, k_max, 0.0) for x in cand_boxes])
    ss = jnp.concatenate([_pad_to(x, k_max, NEG_INF) for x in cand_scores])
    sv = jnp.concatenate([_pad_to(x, k_max, False) for x in cand_valid])
    keep = batched_nms(sb, ss, sv, rpn_cfg["nms_thresh"])  # [L*B, k_max]

    masked = jnp.where(keep, ss, NEG_INF)
    k_post = min(post_nms, k_max)
    sel_scores, sel = jax.lax.top_k(masked, k_post)  # [L*B, k_post]
    sel_valid = sel_scores > NEG_INF / 2
    sel_boxes = jnp.where(
        sel_valid[..., None],
        jnp.take_along_axis(sb, sel[..., None], axis=1),
        0.0,
    )
    sel_scores = jnp.where(sel_valid, sel_scores, 0.0)
    # [L*B, k_post] -> [B, L*k_post] (level-major per image, as the
    # reference's cat_boxlist over levels)
    boxes = sel_boxes.reshape(num_levels, b, k_post, 4).transpose(
        1, 0, 2, 3
    ).reshape(b, num_levels * k_post, 4)
    scores = sel_scores.reshape(num_levels, b, k_post).transpose(1, 0, 2).reshape(
        b, num_levels * k_post
    )
    valid = sel_valid.reshape(num_levels, b, k_post).transpose(1, 0, 2).reshape(
        b, num_levels * k_post
    )

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

    # batched matcher outside the vmap: the Pallas kernel keeps the whole
    # anchor array in VMEM and bounds its gt loop by the actual per-image
    # gt count (ops/pallas/matcher_kernel.py); lax streaming fallback off-TPU
    matched_all = match_anchors_batched(anchors, gt_boxes, gt_valid, fg_iou, bg_iou)

    def per_image(anchors_vis, matched, gt_b, obj, reg, key):
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
        anchors_visible, matched_all, gt_boxes, objectness, bbox_reg, keys
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
