"""Pallas TPU kernel: multi-level ROIAlign as patch-DMA + two MXU matmuls,
with window-merged DMA (forward) and window-merged scatter (backward).

XLA's row-gather tops out around 40 GB/s effective on TPU, making the
gather-based pooler the hot spot of the R-CNN step. This kernel exploits
three structural facts:

1. FPN level assignment bounds every ROI's extent *in feature cells* to
   roughly the canonical 14-28 cells (a 1333px image is only 42 cells at
   the coarsest clamped level), so a fixed [PATCH, PATCH] window of the
   assigned level covers (virtually) every ROI's samples. One strided DMA
   per ROI fetches that window at full HBM bandwidth.

2. ROIAlign is separable: with sample weights wy (x) wx, the S x S bin
   average equals (sum-in-bin wy) (x) (sum-in-bin wx), so pooling is EXACTLY
   RowW [P, PATCH_Y] @ patch [PATCH_Y, PATCH_W*C] followed by a per-row
   contraction with ColW [P, PATCH_W] — two tiny MXU matmuls per ROI
   (~4 MFLOP), replacing millions of scattered loads.

3. Training ROIs CLUSTER: the 512 sampled proposals per image concentrate
   around the few ground-truth objects, so with window origins quantized to
   8 cells, ~10 ROIs on average share the exact same (level, image, y0, x0)
   window (measured on the realistic-GT bench distribution). Sorting ROIs
   by window key lets the sequential kernel grid (a) DMA each unique window
   once instead of once per ROI in the forward, and (b) accumulate the
   whole group's gradient in VMEM and do ONE read-modify-write round trip
   per unique window in the backward — a ~10x cut of the dominant HBM
   traffic. Scalar-prefetch data-dependent block indexing keeps the
   outputs in original ROI order (no host-visible permutation).

The bilinear/bin weights (RowW/ColW) are built in plain jnp outside the
kernel — tiny [R, P, PATCH] tensors — carrying all reference semantics
(out-of-image zeroing, edge clamping, the +1-free legacy coords) exactly as
ops/roi_align.py. ROIs larger than PATCH cells (only heavily clamped
boxes at the coarsest level, or pathological aspect ratios) clamp their
outermost samples to the patch border — outside the canonical range where
exactness is already moot; the gather pooler remains available as
TPU.POOLER_BACKEND=gather.

Reference kernel being replaced: csrc/cuda/ROIAlign_cuda.cu:65-257 (the
backward replaces its global-memory atomicAdd scatter, :178-257).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH = 48    # exactly-covered ROI extent (cells)
PATCH_Y = 56  # DMA window rows: 8-quantized y origin + 48-cell extent
PATCH_W = 56  # DMA window cols: 8-aligned x origin + 48-cell extent


def _padded_hw(h, w):
    """Per-level padded dims the kernels operate on: at least the window
    size, AND a multiple of 8 — so the window-origin clip bound
    (dim - PATCH) is itself 8-aligned. A non-aligned bound (e.g. 100-56=44)
    would produce clipped origins that (a) collide with the neighboring
    8-aligned origin in the //8 merge key, pooling edge ROIs from the wrong
    window, and (b) falsify the kernels' multiple_of(x0, 8) sublane hint."""
    rup = lambda v: -(-v // 8) * 8
    return max(PATCH_Y, rup(h)), max(PATCH_W, rup(w))


def _window_rmw_add(grad_refs, acc_ref, tmp_ref, sem, num_levels,
                    lvl, b, y0, x0):
    """grad[lvl][b, y0:y0+PATCH_Y, x0:x0+PATCH_W, :] += acc (one round trip).
    Safe on the sequential TPU grid (no concurrent programs)."""
    for k in range(num_levels):
        @pl.when(lvl == k)
        def _():
            region = grad_refs[k].at[b, pl.ds(y0, PATCH_Y), pl.ds(x0, PATCH_W), :]
            cp_in = pltpu.make_async_copy(region, tmp_ref, sem)
            cp_in.start()
            cp_in.wait()
            tmp_ref[:, :, :] = tmp_ref[:, :, :] + acc_ref[:, :, :]
            cp_out = pltpu.make_async_copy(tmp_ref, region, sem)
            cp_out.start()
            cp_out.wait()


def _kernel(perm_ref, newg_ref, lvl_ref, b_ref, y0_ref, x0_ref,
            roww_ref, colw_ref, *rest, num_levels, p, c):
    level_refs = rest[:num_levels]
    out_ref = rest[num_levels]
    patch_ref, sem = rest[num_levels + 1:]

    i = pl.program_id(0)
    j = perm_ref[i]
    lvl = lvl_ref[j]
    b = b_ref[j]
    y0 = y0_ref[j]
    x0 = pl.multiple_of(x0_ref[j], 8)

    # one DMA per unique window: ROIs are visited in window-sorted order and
    # patch_ref persists across the sequential grid
    for k in range(num_levels):
        @pl.when((newg_ref[i] == 1) & (lvl == k))
        def _():
            cp = pltpu.make_async_copy(
                level_refs[k].at[b, pl.ds(y0, PATCH_Y), pl.ds(x0, PATCH_W), :],
                patch_ref,
                sem,
            )
            cp.start()
            cp.wait()

    patch = patch_ref[:, :, :].reshape(PATCH_Y, PATCH_W * c)
    roww = roww_ref[0]  # [P, PATCH_Y] f32
    if patch.dtype == jnp.float32:
        a = jnp.dot(roww, patch, preferred_element_type=jnp.float32)
    else:
        # split-f32 matmul: keep the (bf16) patch un-cast — the 800K-element
        # f32 cast per ROI costs more than the matmul — and recover f32
        # weight precision as hi+lo bf16 passes (error ~2^-16 relative)
        hi = roww.astype(jnp.bfloat16)
        lo = (roww - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        a = jnp.dot(hi, patch, preferred_element_type=jnp.float32) + jnp.dot(
            lo, patch, preferred_element_type=jnp.float32
        )
    a = a.reshape(p, PATCH_W, c)

    # column contraction as p small MXU matmuls (a VPU sweep of `a` per
    # output column is ~2 us/ROI; the MXU does it in ~0.1):
    # out[pi, q, ch] = sum_w colw[q, w] * a[pi, w, ch]
    colw = colw_ref[0]  # [P, PATCH_W] f32
    for pi in range(p):  # a is already f32 (preferred_element_type above)
        out_ref[0, pi] = jnp.dot(colw, a[pi], preferred_element_type=jnp.float32)


def _bin_weights(coords, mask, n_bins, s, patch_extent):
    """Separable ROIAlign weights.

    coords: [R, P*S] sample positions relative to the patch origin;
    mask: [R, P*S] validity (inside the image); returns [R, P, patch_extent]
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


def _precompute(features, boxes, batch_idx, pcfg):
    """The (perm, newg, lvl, b, y0, x0, roww, colw) tuple the kernels consume.

    Window origins are quantized (y to 8 rows; x was already 8-aligned for
    sublane tiling), ROIs are sorted by (level, image, y0, x0) key, and
    newg[i] marks the first ROI of each unique-window group in sorted order.
    """
    from ...models.poolers import assign_levels

    p = pcfg.output_size[0]
    s = pcfg.sampling_ratio
    ps = p * s
    num_levels = len(features)
    b_sz = features[0].shape[0]

    hs = jnp.asarray([_padded_hw(f.shape[1], f.shape[2])[0] for f in features],
                     jnp.int32)
    ws = jnp.asarray([_padded_hw(f.shape[1], f.shape[2])[1] for f in features],
                     jnp.int32)
    true_hs = jnp.asarray([f.shape[1] for f in features], jnp.int32)
    true_ws = jnp.asarray([f.shape[2] for f in features], jnp.int32)
    scales = jnp.asarray(pcfg.scales, jnp.float32)

    if num_levels == 1:
        lvl = jnp.zeros((boxes.shape[0],), jnp.int32)
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
    ys = rois[:, 1:2] + iy[None] * bin_h[:, None] + (sy[None] + 0.5) * (bin_h[:, None] / s)
    xs = rois[:, 0:1] + iy[None] * bin_w[:, None] + (sy[None] + 0.5) * (bin_w[:, None] / s)
    # reference boundary semantics (ROIAlign_cuda.cu bilinear_interpolate):
    # outside [-1, H] -> 0; otherwise clamp into [0, H-1]
    ymask = (ys >= -1.0) & (ys <= h_l[:, None])
    xmask = (xs >= -1.0) & (xs <= w_l[:, None])
    ys = jnp.clip(ys, 0.0, h_l[:, None] - 1.0)
    xs = jnp.clip(xs, 0.0, w_l[:, None] - 1.0)
    # quantized window origins (merging needs exact origin ties; the window
    # is 8 rows/cols larger than the covered extent to absorb quantization)
    y0 = jnp.clip(
        (jnp.floor(ys.min(axis=1)).astype(jnp.int32) // 8) * 8,
        0, hs[lvl] - PATCH_Y,
    )
    x0 = jnp.clip(
        (jnp.floor(xs.min(axis=1)).astype(jnp.int32) // 8) * 8,
        0, ws[lvl] - PATCH_W,
    )
    roww = _bin_weights(ys - y0[:, None].astype(jnp.float32), ymask, p, s, PATCH_Y)
    colw = _bin_weights(xs - x0[:, None].astype(jnp.float32), xmask, p, s, PATCH_W)

    key = ((lvl * b_sz + batch_idx.astype(jnp.int32)) * 1024 + y0 // 8) * 1024 + x0 // 8
    perm = jnp.argsort(key).astype(jnp.int32)
    sk = key[perm]
    newg = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sk[1:] != sk[:-1]).astype(jnp.int32)]
    )
    return (perm, newg, lvl, batch_idx.astype(jnp.int32), y0, x0, roww, colw)


def multilevel_roi_align_pallas(features, boxes, batch_idx, pcfg,
                                compute_dtype=jnp.bfloat16, interpret=False):
    """Drop-in for models.poolers.multilevel_roi_align (FPN case)."""
    ph, pw = pcfg.output_size
    assert ph == pw, "square pooling only"
    assert features[0].shape[-1] % 128 == 0, (
        "pallas pooler needs channels %% 128 == 0 (mosaic reshape tiling); "
        "use the gather backend otherwise"
    )
    p = ph
    c = features[0].shape[-1]
    r = boxes.shape[0]
    num_levels = len(features)

    # pad small levels so a window always fits
    feats = []
    for f in features:
        ph, pw = _padded_hw(f.shape[1], f.shape[2])
        hpad = ph - f.shape[1]
        wpad = pw - f.shape[2]
        if hpad or wpad:
            f = jnp.pad(f, ((0, 0), (0, hpad), (0, wpad), (0, 0)))
        feats.append(f.astype(compute_dtype))

    perm, newg, lvl, bidx, y0, x0, roww, colw = _precompute(
        features, boxes, batch_idx, pcfg
    )
    kernel = functools.partial(_kernel, num_levels=num_levels, p=p, c=c)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, p, PATCH_Y), lambda i, perm, *_: (perm[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, PATCH_W), lambda i, perm, *_: (perm[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.ANY) for _ in feats],
        out_specs=pl.BlockSpec((1, p, p, c), lambda i, perm, *_: (perm[i], 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((PATCH_Y, PATCH_W, c), compute_dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, p, p, c), jnp.float32),
        interpret=interpret,
    )(perm, newg, lvl, bidx, y0, x0, roww, colw, *feats)
    return out.astype(compute_dtype)


# -- backward (training): window-merged scatter-accumulate ----------------------


def _bwd_kernel(perm_ref, newg_ref, lvl_ref, b_ref, y0_ref, x0_ref,
                roww_ref, colw_ref, dout_ref, *rest, num_levels, p, c, r_total):
    """Accumulate each window group's dPatch sum in VMEM, then ONE RMW round
    trip per unique window into the per-level gradient buffers. Both weight
    contractions (column-unmix and row-unmix) happen in-kernel as MXU dots
    from the tiny [P, P, C] cotangent block — materializing the unmixed
    [R, P, PATCH_W, C] tensor in HBM (1.6 GB at R=4096) costs more than the
    matmuls. The TPU grid is sequential, so overlapping windows accumulate
    without races."""
    zin_refs = rest[:num_levels]              # aliased zero-init inputs
    grad_refs = rest[num_levels:2 * num_levels]  # outputs (aliased)
    t_ref, acc_ref, tmp_ref, sem = rest[2 * num_levels:]
    del zin_refs  # same memory as grad_refs via input_output_aliases

    i = pl.program_id(0)
    j = perm_ref[i]

    roww = roww_ref[0]  # [P, PATCH_Y]
    colw_t = colw_ref[0].T  # [PATCH_W, P]
    dout = dout_ref[0].astype(jnp.float32)  # [P, P, C]
    # stage 1 (column-unmix): dA[pi, x, ch] = sum_q colw[q, x] dout[pi, q, ch]
    for pi in range(p):
        t_ref[pi] = jnp.dot(colw_t, dout[pi], preferred_element_type=jnp.float32)
    # stage 2 (row-unmix): dPatch = RowW^T @ dA (contract P; avoids transpose)
    dpatch = jax.lax.dot_general(
        roww, t_ref[:, :, :].reshape(p, PATCH_W * c),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(PATCH_Y, PATCH_W, c)

    # group boundary: flush the previous group's accumulated window
    jp = perm_ref[jnp.maximum(i - 1, 0)]

    @pl.when((i > 0) & (newg_ref[i] == 1))
    def _():
        _window_rmw_add(
            grad_refs, acc_ref, tmp_ref, sem, num_levels,
            lvl_ref[jp], b_ref[jp], y0_ref[jp], pl.multiple_of(x0_ref[jp], 8),
        )

    @pl.when(newg_ref[i] == 1)
    def _():
        acc_ref[:, :, :] = dpatch

    @pl.when(newg_ref[i] == 0)
    def _():
        acc_ref[:, :, :] = acc_ref[:, :, :] + dpatch

    # last program flushes the final group
    @pl.when(i == r_total - 1)
    def _():
        _window_rmw_add(
            grad_refs, acc_ref, tmp_ref, sem, num_levels,
            lvl_ref[j], b_ref[j], y0_ref[j], pl.multiple_of(x0_ref[j], 8),
        )


def _roi_align_bwd(pcfg, p, num_levels, shapes, residuals, dout,
                   interpret=False):
    perm, newg, lvl, bidx, y0, x0, roww, colw = residuals
    c = shapes[0][-1]
    r = dout.shape[0]
    zeros = [jnp.zeros(s, jnp.float32) for s in shapes]

    kernel = functools.partial(
        _bwd_kernel, num_levels=num_levels, p=p, c=c, r_total=r
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, p, PATCH_Y), lambda i, perm, *_: (perm[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, PATCH_W), lambda i, perm, *_: (perm[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, p, c), lambda i, perm, *_: (perm[i], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.ANY) for _ in shapes],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.ANY) for _ in shapes
        ),
        scratch_shapes=[
            pltpu.VMEM((p, PATCH_W, c), jnp.float32),
            pltpu.VMEM((PATCH_Y, PATCH_W, c), jnp.float32),
            pltpu.VMEM((PATCH_Y, PATCH_W, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    grads = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes),
        input_output_aliases={
            9 + i: i for i in range(num_levels)  # 6 prefetch + 3 vector ins
        },
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(perm, newg, lvl, bidx, y0, x0, roww, colw, dout, *zeros)
    return grads


def _scatter_windows_bwd(shapes, residuals, dout, chunk=256):
    """Backward via XLA windowed scatter-add (no Pallas).

    Each ROI's feature-gradient is a dense [PATCH_Y, PATCH_W, C] patch
    dPatch = RowW^T @ dOut @ ColW (two small MXU matmuls); all patches are
    then scatter-added into one fused [(L*B), Hmax, Wmax, C] buffer with a
    single lax.scatter_add whose update window IS the patch — XLA turns this
    into a sequential stream of large fused window-RMWs, which (unlike the
    4-neighbor scatter autodiff derives from the gather pooler) moves whole
    multi-MB windows per ROI at near-HBM bandwidth. ROIs are processed in
    chunks under lax.scan so the dPatch intermediate stays bounded.

    Replaces the atomic-add backward of the reference CUDA kernel
    (csrc/cuda/ROIAlign_cuda.cu:178-257) with a TPU-native formulation.
    """
    _, _, lvl, bidx, y0, x0, roww, colw = residuals
    num_levels = len(shapes)
    b = shapes[0][0]
    c = shapes[0][-1]
    # NOTE: one fused buffer padded to the finest level's dims costs ~4x the
    # pyramid's true HBM; acceptable for this non-default fallback backend.
    hm = max(_padded_hw(s[1], s[2])[0] for s in shapes)
    wm = max(_padded_hw(s[1], s[2])[1] for s in shapes)
    r = dout.shape[0]
    p = dout.shape[1]

    pad = (-r) % chunk
    if pad:
        z = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        lvl, bidx, y0, x0, roww, colw, dout = map(
            z, (lvl, bidx, y0, x0, roww, colw, dout)
        )
        r += pad
    slot = lvl * b + bidx  # padded rows carry zero dout -> harmless at slot 0
    inds = jnp.stack([slot, y0, x0], axis=1).reshape(-1, chunk, 3)

    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1, 2),
    )

    def body(op, sl):
        roww_c, colw_c, dout_c, inds_c = sl
        da = jnp.einsum(
            "rqx,rpqc->rpxc", colw_c, dout_c.astype(jnp.float32)
        )
        dpatch = jnp.einsum("rpy,rpxc->ryxc", roww_c, da)
        op = jax.lax.scatter_add(
            op, inds_c, dpatch, dnums,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        return op, None

    op = jnp.zeros((num_levels * b, hm, wm, c), jnp.float32)
    nchunk = r // chunk
    op, _ = jax.lax.scan(
        body,
        op,
        (
            roww.reshape(nchunk, chunk, p, PATCH_Y),
            colw.reshape(nchunk, chunk, p, PATCH_W),
            dout.reshape(nchunk, chunk, p, p, c),
            inds,
        ),
    )
    op = op.reshape(num_levels, b, hm, wm, c)
    return tuple(
        op[i, :, : s[1], : s[2], :] for i, s in enumerate(shapes)
    )


def make_trainable_roi_align(pcfg, compute_dtype=jnp.bfloat16, bwd_impl="rmw",
                             interpret=False):
    """Returns fn(features_tuple, boxes, batch_idx) -> pooled, with a Pallas
    forward and a window-merged scatter-accumulate backward (grads w.r.t.
    features; boxes/batch_idx are treated as non-differentiable).

    bwd_impl: "rmw" (window-merged Pallas read-modify-write kernel, default)
    or "scatter" (XLA windowed scatter-add)."""

    @jax.custom_vjp
    def fn(features, boxes, batch_idx):
        return multilevel_roi_align_pallas(
            list(features), boxes, batch_idx, pcfg, compute_dtype,
            interpret=interpret,
        )

    def fwd(features, boxes, batch_idx):
        # re-run the jnp precompute to capture residuals (cheap; XLA CSEs it
        # with the forward kernel's own precompute)
        out = multilevel_roi_align_pallas(
            list(features), boxes, batch_idx, pcfg, compute_dtype,
            interpret=interpret,
        )
        res = _precompute(list(features), boxes, batch_idx, pcfg)
        return out, (res, tuple(f.shape for f in features), boxes, batch_idx)

    def bwd(saved, dout):
        res, shapes, boxes, batch_idx = saved
        p = pcfg.output_size[0]
        import numpy as _np

        if bwd_impl == "scatter":
            dfeats = tuple(
                g.astype(compute_dtype)
                for g in _scatter_windows_bwd(shapes, res, dout)
            )
        else:
            # grads are for the PADDED maps; slice back to true shapes
            padded_shapes = tuple(
                (s[0],) + _padded_hw(s[1], s[2]) + (s[3],) for s in shapes
            )
            grads = _roi_align_bwd(pcfg, p, len(shapes), padded_shapes, res,
                                   dout, interpret=interpret)
            dfeats = tuple(
                g[:, : s[1], : s[2], :].astype(compute_dtype)
                for g, s in zip(grads, shapes)
            )
        zero_b = _np.zeros(boxes.shape, dtype=jax.dtypes.float0)
        zero_i = _np.zeros(batch_idx.shape, dtype=jax.dtypes.float0)
        return (dfeats, zero_b, zero_i)

    fn.defvjp(fwd, bwd)
    return fn
