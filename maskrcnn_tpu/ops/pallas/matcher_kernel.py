"""Pallas TPU kernel: fused anchor->gt matching (RPN assignment).

Computes ops.matcher.match_anchors_streaming — per-anchor best-IoU gt with
the reference Matcher's threshold sentinels and allow_low_quality restore
(reference: maskrcnn_benchmark/modeling/matcher.py:49-111) — in one kernel.

Why a kernel: at RPN scale (N ~ 270k anchors, G padded to 100 gt) the XLA
scan version streams [G, chunk] IoU blocks through HBM with five reads of
the table equivalent and a [chunks, G, chunk] tie-mask round trip; it costs
~7.5 ms/step at batch 8 on v5e for ~1 GFLOP of VPU math. Here the whole
anchor array (coordinate-major [4, Npad], ~4.5 MB f32) sits in VMEM once,
IoU blocks never leave VMEM, and — the structural win — the gt loop runs
ceil(valid_gt/8) iterations off a prefetched scalar instead of the padded
G=100: typical COCO images carry ~7 gt, a ~12x cut of the inner-loop work
that a fixed-shape XLA scan cannot express.

Two in-kernel passes over the anchor chunks:
  pass 1: per-anchor running (best value, first-achieving gt index) with
          strict-> updates (argmax first-index semantics), plus per-gt best
          IoU accumulated in VMEM scratch (padded anchor columns masked);
  pass 2: recompute IoU and flag anchors that tie a gt's best (the
          low-quality restore), then emit thresholded sentinels. The
          recompute is bit-stable: same expression, same inputs, same
          hardware — the equality against the stored per-gt best is exact.

Grid = (B,): one step per image; the anchor VMEM block is index-invariant
so Mosaic loads it once for the whole batch.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 16384
GT_BLOCK = 8
TO_REMOVE = 1.0  # the reference's +1 box convention (box_ops.box_iou)

BELOW_LOW_QUALITY = -1
BETWEEN_THRESHOLDS = -2


def _iou_block(anc_ref, gt_ref, gv_ref, g0, c0):
    """IoU of gt rows [g0:g0+GT_BLOCK] x anchor cols [c0:c0+CHUNK].
    Invalid gt rows forced to -1. Returns [GT_BLOCK, CHUNK] f32."""
    ax1 = anc_ref[0:1, pl.ds(c0, CHUNK)]  # [1, CHUNK]
    ay1 = anc_ref[1:2, pl.ds(c0, CHUNK)]
    ax2 = anc_ref[2:3, pl.ds(c0, CHUNK)]
    ay2 = anc_ref[3:4, pl.ds(c0, CHUNK)]
    gx1 = gt_ref[0, pl.ds(g0, GT_BLOCK), 0:1]  # [GB, 1]
    gy1 = gt_ref[0, pl.ds(g0, GT_BLOCK), 1:2]
    gx2 = gt_ref[0, pl.ds(g0, GT_BLOCK), 2:3]
    gy2 = gt_ref[0, pl.ds(g0, GT_BLOCK), 3:4]
    gv = gv_ref[0, pl.ds(g0, GT_BLOCK), 0:1]  # [GB, 1] f32 0/1

    area_a = (ax2 - ax1 + TO_REMOVE) * (ay2 - ay1 + TO_REMOVE)  # [1, CHUNK]
    area_g = (gx2 - gx1 + TO_REMOVE) * (gy2 - gy1 + TO_REMOVE)  # [GB, 1]
    iw = jnp.maximum(
        jnp.minimum(gx2, ax2) - jnp.maximum(gx1, ax1) + TO_REMOVE, 0.0
    )
    ih = jnp.maximum(
        jnp.minimum(gy2, ay2) - jnp.maximum(gy1, ay1) + TO_REMOVE, 0.0
    )
    inter = iw * ih  # [GB, CHUNK]
    union = area_g + area_a - inter
    iou = jnp.where(union > 0, inter / union, 0.0)
    return jnp.where(gv > 0, iou, -1.0)


def _matcher_kernel(
    nblocks_ref,  # scalar prefetch: [B] s32, gt blocks to process per image
    anc_ref,      # [4, Npad] f32 VMEM (whole array, shared across images)
    gt_ref,       # [1, G8, 4] f32 VMEM block of [B, G8, 4]
    gv_ref,       # [1, G8, 1] f32 validity
    out_ref,      # [1, C, CHUNK] s32
    vals_ref,     # scratch [C, CHUNK] f32: per-anchor best IoU
    idx_ref,      # scratch [C, CHUNK] s32: per-anchor first-best gt
    best_ref,     # scratch [G8, 128] f32: per-gt best IoU (lane 0)
    *, n, num_chunks, high, low,
):
    b = pl.program_id(0)
    nb = nblocks_ref[b]
    best_ref[:, :] = jnp.full_like(best_ref[:, :], -1.0)

    def pass1_chunk(c, _):
        c0 = pl.multiple_of(c * CHUNK, CHUNK)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + c0
        col_valid = cols < n

        def gt_body(g, carry):
            bv, bi = carry
            g0 = pl.multiple_of(g * GT_BLOCK, GT_BLOCK)
            iou = _iou_block(anc_ref, gt_ref, gv_ref, g0, c0)
            # per-gt best over REAL anchor columns only
            rm = jnp.max(
                jnp.where(col_valid, iou, -1.0), axis=1, keepdims=True
            )  # [GB, 1]
            cur = best_ref[pl.ds(g0, GT_BLOCK), 0:1]
            best_ref[pl.ds(g0, GT_BLOCK), 0:1] = jnp.maximum(cur, rm)
            # per-anchor best-of-block with first-row tie-break
            cm = jnp.max(iou, axis=0, keepdims=True)  # [1, CHUNK]
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (GT_BLOCK, CHUNK), 0
            )
            first = jnp.min(
                jnp.where(iou == cm, rows, GT_BLOCK), axis=0, keepdims=True
            )
            gidx = g0 + first  # [1, CHUNK]
            better = cm > bv  # strict: earliest gt block wins ties
            return jnp.where(better, cm, bv), jnp.where(better, gidx, bi)

        bv0 = jnp.full((1, CHUNK), -1.0, jnp.float32)
        bi0 = jnp.zeros((1, CHUNK), jnp.int32)
        bv, bi = jax.lax.fori_loop(0, nb, gt_body, (bv0, bi0))
        vals_ref[pl.ds(c, 1), :] = bv
        idx_ref[pl.ds(c, 1), :] = bi
        return 0

    jax.lax.fori_loop(0, num_chunks, pass1_chunk, 0)

    def pass2_chunk(c, _):
        c0 = pl.multiple_of(c * CHUNK, CHUNK)

        def gt_body(g, upd):
            g0 = pl.multiple_of(g * GT_BLOCK, GT_BLOCK)
            iou = _iou_block(anc_ref, gt_ref, gv_ref, g0, c0)
            bg = best_ref[pl.ds(g0, GT_BLOCK), 0:1]  # [GB, 1]
            tie = jnp.where((iou == bg) & (bg > 0), 1.0, 0.0)
            return jnp.maximum(upd, jnp.max(tie, axis=0, keepdims=True))

        upd = jax.lax.fori_loop(
            0, nb, gt_body, jnp.zeros((1, CHUNK), jnp.float32)
        )
        v = vals_ref[pl.ds(c, 1), :]
        i = idx_ref[pl.ds(c, 1), :]
        out = jnp.where(v < low, BELOW_LOW_QUALITY, i)
        out = jnp.where((v >= low) & (v < high), BETWEEN_THRESHOLDS, out)
        out_ref[0, pl.ds(c, 1), :] = jnp.where(upd > 0, i, out)
        return 0

    jax.lax.fori_loop(0, num_chunks, pass2_chunk, 0)


@functools.partial(jax.jit, static_argnames=("high_threshold", "low_threshold", "interpret"))
def match_anchors_pallas(
    anchors,  # [N, 4] f32 (shared across the batch)
    gt_boxes,  # [B, G, 4] f32
    gt_valid,  # [B, G] bool
    high_threshold,
    low_threshold,
    interpret=False,
):
    """Batched matcher: returns [B, N] s32 with the same contract as
    vmap(match_anchors_streaming). TPU-only (lax fallback in ops.matcher)."""
    n = anchors.shape[0]
    b, g = gt_valid.shape
    num_chunks = -(-n // CHUNK)
    npad = num_chunks * CHUNK
    g8 = -(-g // GT_BLOCK) * GT_BLOCK

    anc_t = jnp.pad(anchors.astype(jnp.float32), ((0, npad - n), (0, 0))).T
    gt = jnp.pad(gt_boxes.astype(jnp.float32), ((0, 0), (0, g8 - g), (0, 0)))
    gvf = jnp.pad(
        gt_valid.astype(jnp.float32), ((0, 0), (0, g8 - g))
    )[..., None]
    # per-image gt-block count: blocks up to the LAST valid row (validity
    # holes inside are masked in-kernel, so only the tail is skipped)
    last = jnp.max(
        jnp.where(gt_valid, jnp.arange(g, dtype=jnp.int32)[None, :], -1),
        axis=1,
    )
    nblocks = (last + GT_BLOCK) // GT_BLOCK  # 0 when no valid gt

    kernel = functools.partial(
        _matcher_kernel,
        n=n,
        num_chunks=num_chunks,
        high=high_threshold,
        low=low_threshold,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((4, npad), lambda i, *_: (0, 0)),
                pl.BlockSpec((1, g8, 4), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, g8, 1), lambda i, *_: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, num_chunks, CHUNK), lambda i, *_: (i, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((num_chunks, CHUNK), jnp.float32),
                pltpu.VMEM((num_chunks, CHUNK), jnp.int32),
                pltpu.VMEM((g8, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, num_chunks, CHUNK), jnp.int32),
        interpret=interpret,
    )(nblocks, anc_t, gt, gvf)
    return out.reshape(b, npad)[:, :n]
