"""Pallas TPU kernel: multi-level ROIAlign as patch-DMA + two MXU matmuls.

XLA's row-gather tops out around 40 GB/s effective on TPU, making the
gather-based pooler the hot spot of the R-CNN step. This kernel exploits
two structural facts:

1. FPN level assignment bounds every ROI's extent *in feature cells* to
   roughly the canonical 14-28 cells (a 1333px image is only 42 cells at
   the coarsest clamped level), so a fixed [PATCH, PATCH] window of the
   assigned level covers (virtually) every ROI's samples. One strided DMA
   per ROI fetches that window at full HBM bandwidth.

2. ROIAlign is separable: with sample weights wy (x) wx, the S x S bin
   average equals (sum-in-bin wy) (x) (sum-in-bin wx), so pooling is EXACTLY
   RowW [P, PATCH] @ patch [PATCH, PATCH*C] followed by a per-row
   contraction with ColW [P, PATCH] — two tiny MXU matmuls per ROI
   (~4 MFLOP), replacing millions of scattered loads.

The bilinear/bin weights (RowW/ColW) are built in plain jnp outside the
kernel — tiny [R, P, PATCH] tensors — carrying all reference semantics
(out-of-image zeroing, edge clamping, the +1-free legacy coords) exactly as
ops/roi_align.py. ROIs larger than PATCH cells (only heavily clamped
boxes at the coarsest level) clamp their outermost samples to the patch
border — outside the canonical range where exactness is already moot; the
gather pooler remains available as TPU.POOLER_BACKEND=gather.

Reference kernel being replaced: csrc/cuda/ROIAlign_cuda.cu:65-257.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH = 48   # rows (y) of the DMA'd window
PATCH_W = 56  # cols (x): 8-aligned origin + 48-cell extent (sublane tiling
              # requires x0 % 8 == 0, so up to 7 extra lead columns)


def _kernel(lvl_ref, b_ref, y0_ref, x0_ref, roww_ref, colw_ref, *rest,
            num_levels, p, c):
    level_refs = rest[:num_levels]
    out_ref = rest[num_levels]
    patch_ref, sem = rest[num_levels + 1:]

    r = pl.program_id(0)
    lvl = lvl_ref[r]
    b = b_ref[r]
    y0 = y0_ref[r]
    x0 = pl.multiple_of(x0_ref[r], 8)

    for k in range(num_levels):
        @pl.when(lvl == k)
        def _():
            cp = pltpu.make_async_copy(
                level_refs[k].at[b, pl.ds(y0, PATCH), pl.ds(x0, PATCH_W), :],
                patch_ref,
                sem,
            )
            cp.start()
            cp.wait()

    patch = patch_ref[:, :, :].astype(jnp.float32).reshape(PATCH, PATCH_W * c)
    roww = roww_ref[0]  # [P, PATCH]
    a = jnp.dot(roww, patch, preferred_element_type=jnp.float32)
    a = a.reshape(p, PATCH_W, c)

    def col_step(q, _):
        w = colw_ref[0, pl.ds(q, 1), :]  # [1, PATCH_W]
        out_ref[0, :, q, :] = jnp.sum(a * w.reshape(1, PATCH_W, 1), axis=1)
        return 0

    jax.lax.fori_loop(0, p, col_step, 0)


def _bin_weights(coords, mask, n_bins, s, patch_extent):
    """Separable ROIAlign weights.

    coords: [R, P*S] sample positions relative to the patch origin;
    mask: [R, P*S] validity (inside the image); returns [R, P, PATCH]
    with the in-bin sum of bilinear weights (already / S).
    """
    r, ps = coords.shape
    low = jnp.floor(coords)
    frac = coords - low
    low = low.astype(jnp.int32)
    # clamp into the patch (approximation only for >PATCH-cell ROIs); at
    # low == extent-1 the hi one-hot matches nothing, which is exactly the
    # reference's degenerate-cell case (frac == 0 there for in-range coords)
    low = jnp.clip(low, 0, patch_extent - 1)
    cells = jnp.arange(patch_extent)
    onehot_lo = (low[..., None] == cells).astype(jnp.float32)
    onehot_hi = (low[..., None] + 1 == cells).astype(jnp.float32)
    w = onehot_lo * (1.0 - frac[..., None]) + onehot_hi * frac[..., None]
    w = w * mask[..., None].astype(jnp.float32)
    # sum samples within each bin, / S
    w = w.reshape(r, n_bins, s, patch_extent).sum(axis=2) / s
    return w


def multilevel_roi_align_pallas(features, boxes, batch_idx, pcfg,
                                compute_dtype=jnp.bfloat16, interpret=False):
    """Drop-in for models.poolers.multilevel_roi_align (FPN case)."""
    from ...models.poolers import assign_levels

    ph, pw = pcfg.output_size
    assert ph == pw, "square pooling only"
    p = ph
    s = pcfg.sampling_ratio
    ps = p * s
    b = features[0].shape[0]
    c = features[0].shape[-1]
    r = boxes.shape[0]
    num_levels = len(features)

    # pad small levels so a PATCH window always fits
    feats = []
    for f in features:
        hpad = max(0, PATCH - f.shape[1])
        wpad = max(0, PATCH_W - f.shape[2])
        if hpad or wpad:
            f = jnp.pad(f, ((0, 0), (0, hpad), (0, wpad), (0, 0)))
        feats.append(f.astype(compute_dtype))

    hs = jnp.asarray([f.shape[1] for f in feats], jnp.int32)
    ws = jnp.asarray([f.shape[2] for f in feats], jnp.int32)
    true_hs = jnp.asarray([f.shape[1] for f in features], jnp.int32)
    true_ws = jnp.asarray([f.shape[2] for f in features], jnp.int32)
    scales = jnp.asarray(pcfg.scales, jnp.float32)

    if num_levels == 1:
        lvl = jnp.zeros((r,), jnp.int32)
    else:
        lvl = assign_levels(boxes, pcfg)
    scale = scales[lvl]
    h_l = true_hs[lvl].astype(jnp.float32)
    w_l = true_ws[lvl].astype(jnp.float32)

    rois = boxes.astype(jnp.float32) * scale[:, None]
    rw = jnp.maximum(rois[:, 2] - rois[:, 0], 1.0)
    rh = jnp.maximum(rois[:, 3] - rois[:, 1], 1.0)
    bin_w = rw / p
    bin_h = rh / p

    iy = (jnp.arange(ps) // s).astype(jnp.float32)
    sy = (jnp.arange(ps) % s).astype(jnp.float32)
    ys = rois[:, 1:2] + iy[None] * bin_h[:, None] + (sy[None] + 0.5) * (
        bin_h[:, None] / s
    )
    xs = rois[:, 0:1] + iy[None] * bin_w[:, None] + (sy[None] + 0.5) * (
        bin_w[:, None] / s
    )

    # reference boundary semantics (ROIAlign_cuda.cu bilinear_interpolate):
    # outside [-1, H] -> 0; otherwise clamp into [0, H-1]
    ymask = (ys >= -1.0) & (ys <= h_l[:, None])
    xmask = (xs >= -1.0) & (xs <= w_l[:, None])
    ys = jnp.clip(ys, 0.0, h_l[:, None] - 1.0)
    xs = jnp.clip(xs, 0.0, w_l[:, None] - 1.0)

    # patch origin per roi, clamped so the window stays inside the padded map
    y0 = jnp.clip(
        jnp.floor(ys.min(axis=1)).astype(jnp.int32), 0, hs[lvl] - PATCH
    )
    # x origin 8-aligned (sublane tiling of the DMA slice)
    x0 = jnp.clip(
        (jnp.floor(xs.min(axis=1)).astype(jnp.int32) // 8) * 8,
        0, ws[lvl] - PATCH_W,
    )

    roww = _bin_weights(ys - y0[:, None].astype(jnp.float32), ymask, p, s, PATCH)
    colw = _bin_weights(xs - x0[:, None].astype(jnp.float32), xmask, p, s, PATCH_W)

    kernel = functools.partial(_kernel, num_levels=num_levels, p=p, c=c)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, p, PATCH), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, PATCH_W), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.ANY) for _ in feats],
        out_specs=pl.BlockSpec((1, p, p, c), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((PATCH, PATCH_W, c), compute_dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, p, p, c), jnp.float32),
        interpret=interpret,
    )(lvl, batch_idx.astype(jnp.int32), y0, x0, roww, colw, *feats)
    return out.astype(compute_dtype)
