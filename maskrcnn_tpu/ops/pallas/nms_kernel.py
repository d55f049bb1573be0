"""Pallas TPU kernel: blocked greedy NMS.

Exact greedy hard-NMS (same result as ops/nms.nms_mask) with the blocked
structure of the reference CUDA kernel (csrc/cuda/nms.cu:23-131) recast for
TPU: boxes arrive score-sorted; the grid walks 128-box blocks sequentially
(TPU grid order is sequential, giving the serial dependency for free); each
step resolves in-block suppression with a 128-step scalar loop over a
lane-flattened IoU tile, then suppresses ALL later boxes in one vectorized
[LANES, 128, N] VPU pass. LANES independent problems (batch x level x
class) are carried per grid step on the sublane axis, so the serial loop
cost is amortized across lanes.

Mosaic-dictated layout choices: boxes are coordinate-major [G, 4, N] (lane-
strided column gathers don't lower); the in-block IoU tile lives
row-flattened on the lane axis (dynamic sublane slicing is unreliable);
suppression uses float max(kept*iou) (1D bool reshapes don't lower).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
LANES = 8          # minimum lane-group width (sublane multiple)
MAX_LANES = 32     # widest lane group: the serial in-block loop costs the
                   # same per iteration whether it operates on 8 or 32
                   # sublanes (VPU tiles), so carrying more independent
                   # problems per grid row divides the total serial steps
MAX_SWEEP_CHUNK = 512  # suppression sweep column tile ([LANES, BLOCK, C] f32)
TO_REMOVE = 1.0
# NOTE: Mosaic's fori_loop lowering only supports unroll=1 or a full unroll
# (unroll == num_steps); partial unrolls raise NotImplementedError on real
# TPU (they do lower on the CPU backend, which is how unroll=4 slipped in).
# Full 128-step unroll explodes compile time, so stay at 1.
_UNROLL = 1


def _nms_kernel(boxes_ref, keep_in_ref, keep_ref, iou_scratch, kb_scratch,
                *, n, thresh, chunk, lanes):
    bi = pl.program_id(1)
    start = pl.multiple_of(bi * BLOCK, BLOCK)

    # initialize the output block from the validity mask on the first step
    # of each lane group (the VMEM out block revisits across bi steps; it
    # is NOT preloaded from HBM on hardware)
    @pl.when(bi == 0)
    def _():
        keep_ref[:, :] = keep_in_ref[:, :]

    bx1 = boxes_ref[:, 0, pl.ds(start, BLOCK)]  # [L, T]
    by1 = boxes_ref[:, 1, pl.ds(start, BLOCK)]
    bx2 = boxes_ref[:, 2, pl.ds(start, BLOCK)]
    by2 = boxes_ref[:, 3, pl.ds(start, BLOCK)]

    def iou(ax1, ay1, ax2, ay2, bx1_, by1_, bx2_, by2_):
        # a: [L, T] -> [L, T, 1]; b: [L, M] -> [L, 1, M]
        area_a = (ax2 - ax1 + TO_REMOVE) * (ay2 - ay1 + TO_REMOVE)
        area_b = (bx2_ - bx1_ + TO_REMOVE) * (by2_ - by1_ + TO_REMOVE)
        lt_x = jnp.maximum(ax1[:, :, None], bx1_[:, None, :])
        lt_y = jnp.maximum(ay1[:, :, None], by1_[:, None, :])
        rb_x = jnp.minimum(ax2[:, :, None], bx2_[:, None, :])
        rb_y = jnp.minimum(ay2[:, :, None], by2_[:, None, :])
        iw = jnp.maximum(rb_x - lt_x + TO_REMOVE, 0.0)
        ih = jnp.maximum(rb_y - lt_y + TO_REMOVE, 0.0)
        inter = iw * ih
        union = area_a[:, :, None] + area_b[:, None, :] - inter
        return jnp.where(union > 0, inter / union, 0.0)

    tile = iou(bx1, by1, bx2, by2, bx1, by1, bx2, by2)  # [L, T, T]
    iou_scratch[:, :] = tile.reshape(lanes, BLOCK * BLOCK)
    kb_scratch[:, :] = keep_ref[:, pl.ds(start, BLOCK)]  # [L, T]
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (lanes, BLOCK), 1)

    def body(i, _):
        kb = kb_scratch[:, :]  # [L, T]
        alive = jnp.max(jnp.where(row_idx == i, kb, 0), axis=1, keepdims=True)
        row = iou_scratch[:, pl.ds(pl.multiple_of(i * BLOCK, BLOCK), BLOCK)]
        sup = (alive > 0) & (row_idx > i) & (row > thresh)
        kb_scratch[:, :] = jnp.where(sup, 0, kb)
        return 0

    jax.lax.fori_loop(0, BLOCK, body, 0, unroll=_UNROLL)
    keep_blk = kb_scratch[:, :]
    keep_ref[:, pl.ds(start, BLOCK)] = keep_blk

    # vectorized suppression of every later box by this block's survivors,
    # in column chunks to bound VMEM ([L, T, CHUNK] tiles). float arithmetic
    # (max of kept*iou) avoids 1D-bool reshapes.
    keptf = keep_blk.astype(jnp.float32)[:, :, None]
    chunk_idx = jax.lax.broadcasted_iota(jnp.int32, (lanes, chunk), 1)

    def sweep(ci, _):
        off = pl.multiple_of(ci * chunk, chunk)
        cx1 = boxes_ref[:, 0, pl.ds(off, chunk)]
        cy1 = boxes_ref[:, 1, pl.ds(off, chunk)]
        cx2 = boxes_ref[:, 2, pl.ds(off, chunk)]
        cy2 = boxes_ref[:, 3, pl.ds(off, chunk)]
        iou_c = iou(bx1, by1, bx2, by2, cx1, cy1, cx2, cy2)  # [L, T, C]
        sup_any = jnp.max(keptf * iou_c, axis=1) > thresh  # [L, C]
        later = (chunk_idx + off) >= start + BLOCK
        cur = keep_ref[:, pl.ds(off, chunk)]
        keep_ref[:, pl.ds(off, chunk)] = jnp.where(later & sup_any, 0, cur)
        return 0

    jax.lax.fori_loop(0, n // chunk, sweep, 0)


def nms_sorted_pallas(boxes, valid, iou_threshold, interpret=False):
    """Greedy NMS on score-sorted boxes.

    boxes: [G, N, 4] (descending score order per lane), valid: [G, N] bool.
    Returns keep [G, N] bool. N is padded to a BLOCK multiple and G to a
    LANES multiple internally.
    """
    g, n, _ = boxes.shape
    n_pad = -(-n // BLOCK) * BLOCK
    # widest lane group that the problem fills: the serial in-block loop
    # runs nb*BLOCK iterations per lane-group ROW, so fewer rows = fewer
    # total serial steps. The sweep chunk shrinks with lane width to hold
    # the [lanes, BLOCK, chunk] IoU tile budget constant.
    lanes = min(MAX_LANES, -(-g // LANES) * LANES)
    # chunk must stay a BLOCK (=128-lane) multiple: Mosaic requires dynamic
    # lane slices to be provably 128-aligned, and off = ci*chunk only is
    # when chunk itself is (lanes=24 used to yield chunk=170 -> hardware
    # compile failure "index in dimension 2 is a multiple of 128")
    chunk = max(MAX_SWEEP_CHUNK * LANES // lanes, BLOCK) // BLOCK * BLOCK
    chunk = min(chunk, n_pad)
    n_pad = -(-n_pad // chunk) * chunk  # chunk must divide the padded width
    g_pad = -(-g // lanes) * lanes
    if n_pad != n or g_pad != g:
        boxes = jnp.pad(boxes, ((0, g_pad - g), (0, n_pad - n), (0, 0)))
        valid = jnp.pad(valid, ((0, g_pad - g), (0, n_pad - n)))
    nb = n_pad // BLOCK

    # Padded/invalid rows get far-away dummy boxes so IoU math stays clean
    # (they can never suppress anything: their keep starts at 0).
    lane = jax.lax.broadcasted_iota(jnp.float32, (g_pad, n_pad, 1), 1)
    dummy = jnp.concatenate(
        [-1e8 + lane * 10.0, -1e8 + lane * 10.0, -1e8 + lane * 10.0 + 1.0,
         -1e8 + lane * 10.0 + 1.0], axis=-1
    )
    boxes = jnp.where(valid[..., None], boxes, dummy)
    boxes_t = jnp.swapaxes(boxes.astype(jnp.float32), 1, 2)  # [G, 4, N]

    kernel = functools.partial(
        _nms_kernel, n=n_pad, thresh=float(iou_threshold), chunk=chunk,
        lanes=lanes,
    )
    keep0 = valid.astype(jnp.int32)
    # optimization_barrier: when the boxes feeding this kernel are ALSO
    # consumed by a later gather in the same program (the proposal top-k
    # after NMS), XLA's fusion/layout choices around the custom call
    # produce a program that hard-faults the TPU at runtime (worker crash;
    # bisected to exactly that gather — the kernel runs clean standalone on
    # identical data). Pinning the operands isolates the kernel's layout
    # from downstream consumers.
    boxes_t, keep0 = jax.lax.optimization_barrier((boxes_t, keep0))
    keep = pl.pallas_call(
        kernel,
        grid=(g_pad // lanes, nb),
        in_specs=[
            pl.BlockSpec((lanes, 4, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, n_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lanes, n_pad), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g_pad, n_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((lanes, BLOCK * BLOCK), jnp.float32),
            pltpu.VMEM((lanes, BLOCK), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(boxes_t, keep0)
    return (keep > 0)[:g, :n]


def nms_mask_pallas(boxes, scores, valid, iou_threshold, interpret=False):
    """Drop-in for ops.nms.batched_nms_mask: boxes [G, N, 4], scores [G, N],
    valid [G, N] -> keep [G, N] (original order)."""
    # decouple this kernel's input pipeline from other consumers of the
    # same arrays (see the barrier note in nms_sorted_pallas): without it,
    # programs where `boxes` also feeds a post-NMS gather fault the TPU
    boxes, scores, valid = jax.lax.optimization_barrier(
        (boxes, scores, valid)
    )
    neg = jnp.asarray(-1e10, scores.dtype)
    masked = jnp.where(valid, scores, neg)
    order = jnp.argsort(-masked, axis=1, stable=True)
    sboxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    svalid = jnp.take_along_axis(valid, order, axis=1)
    keep_sorted = nms_sorted_pallas(sboxes, svalid, iou_threshold, interpret)
    keep_sorted = jax.lax.optimization_barrier(keep_sorted)
    g, n = scores.shape
    keep = jnp.zeros((g, n), bool)
    keep = jax.vmap(lambda k, o, ks: k.at[o].set(ks))(keep, order, keep_sorted)
    return keep
