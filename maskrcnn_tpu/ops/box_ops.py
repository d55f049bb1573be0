"""Box math: IoU, encode/decode (BoxCoder), clipping, area, validity.

Pure jnp, shape-polymorphic over leading batch dims, safe to vmap/jit.

Numerical conventions reproduce the reference bit-for-bit (these silently
cost AP if deviated from — see SURVEY.md §7 "hard parts"):
  * the ``+1`` pixel convention: width = x2 - x1 + 1
    (reference: maskrcnn_benchmark/structures/boxlist_ops.py:53-89,
     structures/bounding_box.py TO_REMOVE)
  * decode subtracts 1 from x2/y2
    (reference: maskrcnn_benchmark/modeling/box_coder.py:76-95)
  * dw/dh clipped at log(1000/16) before exp
    (reference: maskrcnn_benchmark/modeling/box_coder.py:14,73-74)

All functions operate on xyxy float boxes. Box tensors are [..., N, 4].
"""

import math

import jax.numpy as jnp

TO_REMOVE = 1.0
BBOX_XFORM_CLIP = math.log(1000.0 / 16)


def box_area(boxes):
    """Area with the +1 convention. boxes: [..., 4] -> [...]."""
    return (boxes[..., 2] - boxes[..., 0] + TO_REMOVE) * (
        boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    )


def box_iou(boxes1, boxes2):
    """Pairwise IoU. [..., N, 4] x [..., M, 4] -> [..., N, M]."""
    area1 = box_area(boxes1)  # [..., N]
    area2 = box_area(boxes2)  # [..., M]
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt + TO_REMOVE, min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def encode_boxes(reference_boxes, proposals, weights=(1.0, 1.0, 1.0, 1.0)):
    """Regression targets (dx,dy,dw,dh) that map `proposals` onto
    `reference_boxes` (the gt). Mirrors box_coder.encode semantics."""
    wx, wy, ww, wh = weights
    ex_w = proposals[..., 2] - proposals[..., 0] + TO_REMOVE
    ex_h = proposals[..., 3] - proposals[..., 1] + TO_REMOVE
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h

    gt_w = reference_boxes[..., 2] - reference_boxes[..., 0] + TO_REMOVE
    gt_h = reference_boxes[..., 3] - reference_boxes[..., 1] + TO_REMOVE
    gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
    gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

    # Guard against degenerate/padded proposals: widths of padded boxes can
    # be <= 0; clamp so the log stays finite (targets there are masked out).
    ex_w = jnp.maximum(ex_w, 1e-6)
    ex_h = jnp.maximum(ex_h, 1e-6)
    gt_w = jnp.maximum(gt_w, 1e-6)
    gt_h = jnp.maximum(gt_h, 1e-6)

    targets = jnp.stack(
        [
            wx * (gt_cx - ex_cx) / ex_w,
            wy * (gt_cy - ex_cy) / ex_h,
            ww * jnp.log(gt_w / ex_w),
            wh * jnp.log(gt_h / ex_h),
        ],
        axis=-1,
    )
    return targets


def decode_boxes(rel_codes, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """Apply (dx,dy,dw,dh) deltas to anchor/proposal boxes.

    rel_codes: [..., N, 4k] (k classes packed on last dim), boxes: [..., N, 4].
    Returns [..., N, 4k].
    """
    boxes = boxes.astype(rel_codes.dtype)
    wx, wy, ww, wh = weights

    widths = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    heights = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    dx = rel_codes[..., 0::4] / wx
    dy = rel_codes[..., 1::4] / wy
    dw = jnp.minimum(rel_codes[..., 2::4] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(rel_codes[..., 3::4] / wh, BBOX_XFORM_CLIP)

    pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
    pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    out = jnp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w - 1,
            pred_ctr_y + 0.5 * pred_h - 1,
        ],
        axis=-1,
    )  # [..., N, k, 4]
    return out.reshape(rel_codes.shape)


def clip_boxes_to_image(boxes, image_size):
    """Clip to [0, size-1].

    image_size = (h, w); each is a scalar or an array broadcastable against
    boxes[..., 0] (e.g. shape [B, 1] for per-image sizes with boxes [B, N, 4]).
    """
    h, w = image_size
    h = jnp.asarray(h, boxes.dtype)
    w = jnp.asarray(w, boxes.dtype)
    x1 = jnp.clip(boxes[..., 0], 0, w - TO_REMOVE)
    y1 = jnp.clip(boxes[..., 1], 0, h - TO_REMOVE)
    x2 = jnp.clip(boxes[..., 2], 0, w - TO_REMOVE)
    y2 = jnp.clip(boxes[..., 3], 0, h - TO_REMOVE)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def small_box_mask(boxes, min_size):
    """True for boxes with both sides >= min_size (reference
    remove_small_boxes, boxlist_ops.py:34-48)."""
    ws = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    hs = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return (ws >= min_size) & (hs >= min_size)
