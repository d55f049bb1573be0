"""Pallas TPU kernel: blocked greedy NMS.

Exact greedy hard-NMS (same result as ops/nms.nms_mask) with the blocked
structure of the reference CUDA kernel (csrc/cuda/nms.cu:23-131) recast for
TPU: boxes arrive score-sorted; the grid walks 128-box blocks sequentially
(TPU grid order is sequential, giving the serial dependency for free); each
step resolves in-block suppression with a 128-step scalar loop over a
precomputed 128x128 IoU tile, then suppresses ALL later boxes in one
vectorized [128, N] VPU pass. Total scalar work is N tiny steps instead of
N full-width passes; everything lives in VMEM.

Layout notes (mosaic constraints): boxes are carried coordinate-major
[G, 4, N] so every read is a full-lane row (lane-strided column gathers
don't lower); the scalar "is box i alive" check is a masked reduction.

A leading lanes dimension batches independent NMS problems
(batch x level x class) through the same grid.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
TO_REMOVE = 1.0


def _iou_tile(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Coordinate vectors a:[T], b:[M] -> IoU [T, M] (+1 convention)."""
    area_a = (ax2 - ax1 + TO_REMOVE) * (ay2 - ay1 + TO_REMOVE)
    area_b = (bx2 - bx1 + TO_REMOVE) * (by2 - by1 + TO_REMOVE)
    lt_x = jnp.maximum(ax1[:, None], bx1[None, :])
    lt_y = jnp.maximum(ay1[:, None], by1[None, :])
    rb_x = jnp.minimum(ax2[:, None], bx2[None, :])
    rb_y = jnp.minimum(ay2[:, None], by2[None, :])
    iw = jnp.maximum(rb_x - lt_x + TO_REMOVE, 0.0)
    ih = jnp.maximum(rb_y - lt_y + TO_REMOVE, 0.0)
    inter = iw * ih
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _nms_kernel(boxes_ref, keep_in_ref, keep_ref, iou_scratch, kb_scratch,
                *, n, thresh):
    bi = pl.program_id(1)
    start = pl.multiple_of(bi * BLOCK, BLOCK)

    # initialize the output block from the validity mask on the first step
    # of each lane (the VMEM out block revisits across bi steps; it is NOT
    # preloaded from HBM on hardware)
    @pl.when(bi == 0)
    def _():
        keep_ref[0, 0, :] = keep_in_ref[0, 0, :]

    x1 = boxes_ref[0, 0, :]
    y1 = boxes_ref[0, 1, :]
    x2 = boxes_ref[0, 2, :]
    y2 = boxes_ref[0, 3, :]
    bx1 = boxes_ref[0, 0, pl.ds(start, BLOCK)]
    by1 = boxes_ref[0, 1, pl.ds(start, BLOCK)]
    bx2 = boxes_ref[0, 2, pl.ds(start, BLOCK)]
    by2 = boxes_ref[0, 3, pl.ds(start, BLOCK)]

    # The in-block IoU tile is stored row-flattened on the LANE axis so the
    # scalar loop can read row i with an aligned lane-dim dynamic slice
    # (dynamic sublane slicing is unreliable in mosaic).
    tile = _iou_tile(bx1, by1, bx2, by2, bx1, by1, bx2, by2)
    iou_scratch[0, :] = tile.reshape(1, BLOCK * BLOCK)[0]
    kb_scratch[0, :] = keep_ref[0, 0, pl.ds(start, BLOCK)]
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (BLOCK,), 0)

    def body(i, _):
        kb = kb_scratch[0, :]
        alive = jnp.max(jnp.where(row_idx == i, kb, 0)) > 0
        row = iou_scratch[0, pl.ds(pl.multiple_of(i * BLOCK, BLOCK), BLOCK)]
        sup = alive & (row_idx > i) & (row > thresh)
        kb_scratch[0, :] = jnp.where(sup, 0, kb)
        return 0

    jax.lax.fori_loop(0, BLOCK, body, 0)
    keep_blk = kb_scratch[0, :]
    keep_ref[0, 0, pl.ds(start, BLOCK)] = keep_blk

    # vectorized suppression of every later box by this block's survivors.
    # float arithmetic (max of kept*iou) avoids 1D-bool reshapes that
    # mosaic cannot lower: iou >= 0 and kept in {0,1}.
    iou_all = _iou_tile(bx1, by1, bx2, by2, x1, y1, x2, y2)  # [T, N]
    keptf = keep_blk.astype(jnp.float32)[:, None]
    sup_any = jnp.max(keptf * iou_all, axis=0) > thresh  # [N]
    pos = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    later = pos >= start + BLOCK
    cur = keep_ref[0, 0, :]
    keep_ref[0, 0, :] = jnp.where(later & sup_any, 0, cur)


def nms_sorted_pallas(boxes, valid, iou_threshold, interpret=False):
    """Greedy NMS on score-sorted boxes.

    boxes: [G, N, 4] (descending score order per lane), valid: [G, N] bool.
    Returns keep [G, N] bool. N is padded to a BLOCK multiple internally.
    """
    g, n, _ = boxes.shape
    n_pad = -(-n // BLOCK) * BLOCK
    if n_pad != n:
        boxes = jnp.pad(boxes, ((0, 0), (0, n_pad - n), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, n_pad - n)))
    nb = n_pad // BLOCK

    # Padded/invalid rows get far-away dummy boxes so IoU math stays clean
    # (they can never suppress anything: their keep starts at 0).
    lane = jax.lax.broadcasted_iota(jnp.float32, (g, n_pad, 1), 1)
    dummy = jnp.concatenate(
        [-1e8 + lane * 10.0, -1e8 + lane * 10.0, -1e8 + lane * 10.0 + 1.0,
         -1e8 + lane * 10.0 + 1.0], axis=-1
    )
    boxes = jnp.where(valid[..., None], boxes, dummy)
    boxes_t = jnp.swapaxes(boxes.astype(jnp.float32), 1, 2)  # [G, 4, N]

    kernel = functools.partial(_nms_kernel, n=n_pad, thresh=float(iou_threshold))
    keep0 = valid.astype(jnp.int32)[:, None, :]  # [G, 1, N] for TPU tiling
    keep = pl.pallas_call(
        kernel,
        grid=(g, nb),
        in_specs=[
            pl.BlockSpec((1, 4, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n_pad), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 1, n_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, BLOCK * BLOCK), jnp.float32),
            pltpu.VMEM((1, BLOCK), jnp.int32),
        ],
        interpret=interpret,
    )(boxes_t, keep0)
    return (keep[:, 0] > 0)[:, :n]


def nms_mask_pallas(boxes, scores, valid, iou_threshold, interpret=False):
    """Drop-in for ops.nms.batched_nms_mask: boxes [G, N, 4], scores [G, N],
    valid [G, N] -> keep [G, N] (original order)."""
    neg = jnp.asarray(-1e10, scores.dtype)
    masked = jnp.where(valid, scores, neg)
    order = jnp.argsort(-masked, axis=1, stable=True)
    sboxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    svalid = jnp.take_along_axis(valid, order, axis=1)
    keep_sorted = nms_sorted_pallas(sboxes, svalid, iou_threshold, interpret)
    g, n = scores.shape
    keep = jnp.zeros((g, n), bool)
    keep = jax.vmap(lambda k, o, ks: k.at[o].set(ks))(keep, order, keep_sorted)
    return keep
