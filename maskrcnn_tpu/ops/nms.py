"""Fixed-shape (padded) non-maximum suppression.

The reference implements greedy hard-NMS as a CUDA kernel returning a
variable-length index tensor (reference: csrc/cuda/nms.cu:23-131,
csrc/cpu/nms_cpu.cpp:6-75). On TPU, variable-length outputs would force a
host round-trip per call, so NMS here is recast as a *masking* op: inputs are
padded [N] arrays with a validity mask, the output is a keep-mask (and
convenience wrappers that return the top-K surviving boxes, still padded).
Everything is jit/vmap-safe with static shapes.

Semantics match the reference exactly: suppression when IoU > threshold, IoU
with the +1 pixel convention, boxes processed in descending score order.
Ties are broken by input position (stable sort), matching torch.sort on the
reference path.

`nms_numpy` is the host-side golden reference used by tests and by host-side
evaluation tooling.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .box_ops import TO_REMOVE, box_iou

NEG_INF = -1e10


def nms_mask(boxes, scores, valid, iou_threshold):
    """Greedy NMS keep-mask.

    Args:
      boxes: [N, 4] xyxy (padded rows arbitrary).
      scores: [N].
      valid: [N] bool — padding/pre-filtered rows are False.
      iou_threshold: float.

    Returns:
      keep: [N] bool in the *original* order; True = survives NMS.
    """
    n = boxes.shape[0]
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores, stable=True)
    b = boxes[order]
    v = valid[order]

    def body(i, keep):
        # If box i survives so far, suppress all later boxes with IoU > t.
        row_iou = box_iou(b[i][None, :], b)[0]  # [N]
        later = jnp.arange(n) > i
        suppress = keep[i] & later & (row_iou > iou_threshold)
        return keep & ~suppress

    keep_sorted = jax.lax.fori_loop(0, n, body, v)
    # Scatter back to original order.
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def nms_topk(boxes, scores, valid, iou_threshold, k):
    """NMS then take the top-k survivors by score.

    Returns (boxes [k,4], scores [k], valid [k]); padding rows have
    score 0 / box 0 / valid False.
    """
    keep = nms_mask(boxes, scores, valid, iou_threshold)
    kept_scores = jnp.where(keep, scores, NEG_INF)
    top_scores, idx = jax.lax.top_k(kept_scores, k)
    out_valid = top_scores > NEG_INF / 2
    out_boxes = jnp.where(out_valid[:, None], boxes[idx], 0.0)
    out_scores = jnp.where(out_valid, top_scores, 0.0)
    return out_boxes, out_scores, out_valid


def batched_nms_mask(boxes, scores, valid, iou_threshold):
    """vmap of nms_mask over a leading batch dim ([B, N, 4] etc.)."""
    return jax.vmap(lambda b, s, v: nms_mask(b, s, v, iou_threshold))(
        boxes, scores, valid
    )


def _use_pallas():
    import os

    backend = os.environ.get("MASKRCNN_TPU_NMS_BACKEND", "auto")
    if backend == "lax":
        return False
    if backend == "pallas":
        return True
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return platform in ("tpu", "axon")


def batched_nms(boxes, scores, valid, iou_threshold):
    """Backend dispatcher: blocked Pallas kernel on TPU, lax fallback
    elsewhere. Same contract as batched_nms_mask."""
    if _use_pallas():
        from .pallas.nms_kernel import nms_mask_pallas

        return nms_mask_pallas(boxes, scores, valid, iou_threshold)
    return batched_nms_mask(boxes, scores, valid, iou_threshold)


def multiclass_nms_mask(boxes, scores, labels, valid, iou_threshold):
    """Per-class NMS without a per-class loop: offset boxes by label so
    different classes never overlap (the standard batched-NMS trick; the
    reference loops classes in python, box_head/inference.py:79-106).

    boxes [N,4], scores [N], labels [N] int, valid [N]."""
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + TO_REMOVE
    offsets = labels.astype(boxes.dtype)[:, None] * (max_coord + 1.0)
    return nms_mask(boxes + offsets, scores, valid, iou_threshold)


def nms_numpy(boxes, scores, iou_threshold):
    """Host golden: greedy NMS, +1 convention. Returns kept indices
    (descending score order), matching the reference CPU kernel
    (csrc/cpu/nms_cpu.cpp:6-75)."""
    boxes = np.asarray(boxes, np.float64)
    scores = np.asarray(scores, np.float64)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for _i in range(len(order)):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(i)
        rest = order[_i + 1:]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas[rest] - inter)
        suppressed[rest[iou > iou_threshold]] = True
    return np.array(keep, np.int64)
