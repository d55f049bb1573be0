"""Multi-level ROIAlign pooler (fused single-gather design).

Reference: maskrcnn_benchmark/modeling/poolers.py:11-133 — assigns each ROI
to an FPN level (FPN paper eqn. 1), pools per level, then scatters results
back by index. That design needs dynamic per-level ROI sets.

TPU-native redesign: all pyramid levels are flattened and concatenated into
ONE [sum_l(B*Hl*Wl), C] buffer; each ROI computes its level, looks up that
level's (offset, stride, H, W) from small static tables, and bilinearly
gathers its samples directly out of the fused buffer. One gather for all
ROIs across all levels — no scatter, no per-level batching, fixed shapes.
"""

import math

import os

import jax
import jax.numpy as jnp

from ..ops.box_ops import TO_REMOVE

# Chunk the gather pooler's ROI axis once the materialized sample tensor
# would exceed this (see multilevel_roi_align); tests lower it to force the
# chunked path on tiny shapes.
_CHUNK_THRESHOLD_BYTES = 1 << 29  # 512 MB


class PoolerConfig:
    def __init__(self, output_size, scales, sampling_ratio, canonical_scale=224,
                 canonical_level=4, adaptive_max=8):
        self.output_size = (
            (output_size, output_size) if isinstance(output_size, int) else tuple(output_size)
        )
        self.scales = tuple(scales)
        # the reference's sampling_ratio=0 means "adaptive ceil(roi/bin)":
        # realized exactly with an adaptive_max static sample superset whose
        # per-sample weights select the true per-ROI grid (ops/roi_align.py
        # adaptive_axis_samples). sampling_ratio stays the static grid the
        # Pallas kernels use when not adaptive.
        self.adaptive = int(sampling_ratio) == 0
        self.adaptive_max = int(adaptive_max)
        self.sampling_ratio = int(sampling_ratio) if sampling_ratio > 0 else 2
        # LevelMapper constants (poolers.py:23-42)
        self.k_min = -int(math.log2(self.scales[0]))
        self.k_max = -int(math.log2(self.scales[-1]))
        self.canonical_scale = canonical_scale
        self.canonical_level = canonical_level


def assign_levels(boxes, pcfg):
    """FPN paper eqn.1 level per ROI (0-based into the pyramid list)."""
    area = jnp.maximum(boxes[..., 2] - boxes[..., 0] + TO_REMOVE, 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1] + TO_REMOVE, 0
    )
    s = jnp.sqrt(area)
    target = jnp.floor(
        pcfg.canonical_level + jnp.log2(s / pcfg.canonical_scale + 1e-6)
    )
    target = jnp.clip(target, pcfg.k_min, pcfg.k_max)
    return (target - pcfg.k_min).astype(jnp.int32)


def _dense_axis_weights(coords, w, size, p, s):
    """Dense separable ROIAlign weights over a full feature axis.

    coords/w: [R, p*s] adaptive sample positions and weights along one axis
    (see ops/roi_align.adaptive_axis_samples). Returns [R, p, size] where
    out[r, i, y] is the total weight of feature row y in output bin i —
    exactly the gather path's per-sample semantics (outside [-1, size]
    zeroed, clamped bilinear split across floor/ceil rows, boundary snap)
    summed per row. Separability: the 2D sample weight factorizes as
    wy*wx and the (y, x) validity as y_ok * x_ok, so folding each axis's
    validity into its own weight reproduces the joint zeroing."""
    r, ps = coords.shape
    outside = (coords < -1.0) | (coords > float(size))
    y = jnp.clip(coords, 0.0, None)
    y_low = jnp.minimum(y.astype(jnp.int32), size - 1)
    y_high = jnp.minimum(y_low + 1, size - 1)
    y = jnp.where(y_low >= size - 1, y_low.astype(y.dtype), y)
    ly = y - y_low
    hy = 1.0 - ly
    w_eff = jnp.where(outside, 0.0, w)
    rows = jnp.arange(size, dtype=jnp.int32)
    dense = (
        (w_eff * hy)[:, :, None] * (rows == y_low[:, :, None])
        + (w_eff * ly)[:, :, None] * (rows == y_high[:, :, None])
    )  # [R, ps, size]
    return dense.reshape(r, p, s, size).sum(axis=2)


def _c4_matmul_pool(feature, boxes, pcfg, k_per_image, s, compute_dtype):
    """Single-level adaptive ROIAlign as batched MXU contractions.

    The C4 train path pools R = B*512 ROIs at sampling_ratio=0 from ONE
    res4 map. The exact-gather superset there costs 4 corner gathers of
    [R, 84, 84, 1024] (~236 GB of gather traffic per step at batch 8 —
    measured 8.7 s/step, MFU 1.2%). ROIAlign is separable, so against a
    SINGLE feature map it is two dense matmuls instead:

        A[b]   = RowW[b] @ F[b]        [K*P, H] @ [H, W*C]       (MXU)
        out[b] = ColW[b] . A[b]        contract W per (b, roi)   (MXU)

    with RowW/ColW the per-ROI dense bin weights over the FULL axis
    (exact same per-sample semantics as the gather path — built by
    _dense_axis_weights). ~630 GFLOP replaces ~236 GB of gather. ROI
    chunking + jax.checkpoint bound the [*, P, W, C] intermediate.

    Caller contract: boxes are per-image contiguous blocks of k_per_image
    rows (image-major), as produced by detector._flatten_rois.
    Reference semantics: ROIAlign_cuda.cu bilinear_interpolate +
    poolers.py LevelMapper degenerate single-level case.
    """
    b, h, w, c = feature.shape
    ph, pw = pcfg.output_size
    r = boxes.shape[0]
    assert r == b * k_per_image

    from ..ops.roi_align import adaptive_axis_samples

    scale = float(pcfg.scales[0])
    rois = boxes.astype(jnp.float32) * scale
    rw = jnp.maximum(rois[:, 2] - rois[:, 0], 1.0)
    rh = jnp.maximum(rois[:, 3] - rois[:, 1], 1.0)
    ys, wy = adaptive_axis_samples(rois[:, 1], rh / ph, ph, s)
    xs, wx = adaptive_axis_samples(rois[:, 0], rw / pw, pw, s)
    roww = _dense_axis_weights(ys, wy, h, ph, s).astype(compute_dtype)
    colw = _dense_axis_weights(xs, wx, w, pw, s).astype(compute_dtype)

    k = k_per_image
    # chunk ROIs so the [B, kc, P, W, C] intermediate stays bounded
    per_roi = b * ph * w * c * jnp.zeros((), compute_dtype).dtype.itemsize
    kc = max(1, min(k, (_CHUNK_THRESHOLD_BYTES // 2) // per_roi))
    while k % kc:
        kc -= 1
    f2 = feature.astype(compute_dtype).reshape(b, h, w * c)
    roww_b = roww.reshape(b, k, ph, h)
    colw_b = colw.reshape(b, k, pw, w)

    def body(args):
        wr, wc = args  # [B, kc, P, H], [B, kc, P, W]
        a = jax.lax.dot_general(
            wr.reshape(b, kc * ph, h), f2,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(compute_dtype).reshape(b, kc, ph, w, c)
        out = jax.lax.dot_general(
            wc, a,
            dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        ).astype(compute_dtype)  # [B, kc, Pj, Pi, C]
        return jnp.swapaxes(out, 2, 3)  # [B, kc, Pi, Pj, C]

    if kc == k:
        out = body((roww_b, colw_b))
    else:
        out = jax.lax.map(
            jax.checkpoint(body),
            (
                jnp.moveaxis(
                    roww_b.reshape(b, k // kc, kc, ph, h), 1, 0
                ),
                jnp.moveaxis(
                    colw_b.reshape(b, k // kc, kc, pw, w), 1, 0
                ),
            ),
        )  # [nc, B, kc, Pi, Pj, C]
        out = jnp.moveaxis(out, 0, 1).reshape(b, k, ph, pw, c)
        return out.reshape(r, ph, pw, c)
    return out.reshape(r, ph, pw, c)


def multilevel_roi_align(features, boxes, batch_idx, pcfg,
                         compute_dtype=jnp.bfloat16, backend="gather",
                         rois_per_image=None):
    """Pool each ROI from its assigned pyramid level.

    backend: "gather" (exact, XLA row-gather; autodiff supplies backward),
    "pallas" (patch-DMA + MXU matmuls kernel, ~3x faster forward; clamps
    samples of >48-cell pathological-aspect ROIs to the patch border —
    inference path), or "pallas_train" (same forward plus a Pallas
    sequential read-modify-write scatter backward via custom_vjp — measured
    1.8x/4.8x faster than the gather autodiff for the box/mask head
    training shapes, tools/bench_pooler.py).

    Args:
      features: list of [B, Hl, Wl, C] arrays, one per scale in pcfg.scales
        (a single-level pooler is the len==1 case).
      boxes: [R, 4] xyxy in image coordinates.
      batch_idx: [R] int32 image index of each ROI.
      pcfg: PoolerConfig.

    Returns [R, ph, pw, C].
    """
    assert len(features) == len(pcfg.scales)
    if pcfg.adaptive:
        backend = "gather"  # per-ROI grids: weight-selected exact gather path
    if backend == "pallas":
        from ..ops.pallas.roi_align_kernel import multilevel_roi_align_pallas

        return multilevel_roi_align_pallas(
            features, boxes, batch_idx, pcfg, compute_dtype
        )
    if backend == "pallas_train":
        from ..ops.pallas.roi_align_kernel import make_trainable_roi_align

        # bwd_impl choice, measured on v5e (tools/bench_pooler.py + bench.py):
        # "roi" (per-ROI grid, window-merged RMW) is the end-to-end default.
        # "chunk" (q window-aligned ROIs per program, one stacked MXU
        # contraction) wins the microbenchmark on tightly clustered ROIs
        # (15.2 vs 22.7 ms, p=7 r=4096) but LOSES end-to-end (51.3 vs 54.7
        # img/s): real sampled training ROIs spread across windows/levels,
        # so chunks straddle window boundaries and fall back to the per-ROI
        # path while still paying the layout-prep gathers. Kept as opt-in.
        impl = os.environ.get(
            "MASKRCNN_POOLER_BWD_P%d" % pcfg.output_size[0],
            os.environ.get("MASKRCNN_POOLER_BWD", "roi"),
        )
        fn = make_trainable_roi_align(pcfg, compute_dtype, bwd_impl=impl)
        return fn(tuple(features), boxes, batch_idx)
    ph, pw = pcfg.output_size
    s = pcfg.adaptive_max if pcfg.adaptive else pcfg.sampling_ratio
    if pcfg.adaptive and len(features) == 1:
        # single-level (C4): ROIs are image-clipped, so the adaptive grid
        # n = ceil(roi_cells / bins) is bounded by the feature map itself —
        # e.g. ceil(84/14) = 6 at 1333 px, ceil(50/14) = 4 at 800 px.
        # Shrinking the static sample superset to that bound cuts the
        # gather/bilinear work ~(adaptive_max/bound)^2 at identical output.
        h0, w0 = features[0].shape[1], features[0].shape[2]
        bound = max(-(-h0 // ph), -(-w0 // pw), 1)
        s = min(s, bound)
        if (
            rois_per_image
            and boxes.shape[0] == features[0].shape[0] * rois_per_image
            and os.environ.get("MASKRCNN_C4_POOLER", "matmul") == "matmul"
        ):
            return _c4_matmul_pool(
                features[0], boxes, pcfg, rois_per_image, s, compute_dtype
            )
    b = features[0].shape[0]
    c = features[0].shape[-1]
    r = boxes.shape[0]

    # Static per-level tables.
    hs = [f.shape[1] for f in features]
    ws = [f.shape[2] for f in features]
    offsets = []
    off = 0
    for hl, wl in zip(hs, ws):
        offsets.append(off)
        off += b * hl * wl
    flat = jnp.concatenate(
        [f.astype(compute_dtype).reshape(-1, c) for f in features], axis=0
    )

    tbl_h = jnp.asarray(hs, jnp.int32)
    tbl_w = jnp.asarray(ws, jnp.int32)
    tbl_off = jnp.asarray(offsets, jnp.int32)
    tbl_scale = jnp.asarray(pcfg.scales, jnp.float32)

    # The sample tensor is [R, ph*s, pw*s, C]. For the C4 adaptive path
    # (s = bound up to 6, C = 1024) materializing it for the full ROI batch
    # is tens of GB — chunk the ROI axis through lax.map so the peak
    # transient stays bounded while every chunk runs the identical
    # vectorized math (bit-identical outputs, just batched).
    itemsize = jnp.zeros((), compute_dtype).dtype.itemsize
    bytes_per_roi = (ph * s) * (pw * s) * c * itemsize
    if r * bytes_per_roi > _CHUNK_THRESHOLD_BYTES:
        chunk = max(1, _CHUNK_THRESHOLD_BYTES // (2 * bytes_per_roi))
        chunk = 1 << (chunk.bit_length() - 1)  # power of two
        r_pad = -(-r // chunk) * chunk
        boxes_p = jnp.pad(boxes, ((0, r_pad - r), (0, 0)))
        bidx_p = jnp.pad(batch_idx, (0, r_pad - r))
        # jax.checkpoint: without it autodiff SAVES each step's sample-
        # tensor residuals across the whole map (e.g. a [steps, chunk,
        # 84, 84, 1024] mask stack — tens of GB, the very thing chunking
        # exists to avoid); rematerializing the chunk's gathers in the
        # backward costs one extra forward gather pass per chunk.
        body = jax.checkpoint(
            lambda bc: _pool_roi_block(
                bc[0], bc[1], flat, tbl_h, tbl_w, tbl_off, tbl_scale,
                pcfg, ph, pw, s, compute_dtype,
            )
        )
        out = jax.lax.map(
            body,
            (
                boxes_p.reshape(r_pad // chunk, chunk, 4),
                bidx_p.reshape(r_pad // chunk, chunk),
            ),
        )
        return out.reshape(r_pad, ph, pw, c)[:r]
    return _pool_roi_block(
        boxes, batch_idx, flat, tbl_h, tbl_w, tbl_off, tbl_scale,
        pcfg, ph, pw, s, compute_dtype,
    )


def _pool_roi_block(boxes, batch_idx, flat, tbl_h, tbl_w, tbl_off, tbl_scale,
                    pcfg, ph, pw, s, compute_dtype):
    """Vectorized ROIAlign for one block of ROIs against the fused
    level-concatenated feature buffer (see multilevel_roi_align)."""
    r = boxes.shape[0]
    c = flat.shape[-1]
    if len(pcfg.scales) == 1:
        lvl = jnp.zeros((r,), jnp.int32)
    else:
        lvl = assign_levels(boxes, pcfg)

    roi_h = tbl_h[lvl]  # [R]
    roi_wl = tbl_w[lvl]
    roi_off = tbl_off[lvl] + batch_idx * (roi_h * roi_wl)
    scale = tbl_scale[lvl]

    rois = boxes.astype(jnp.float32) * scale[:, None]
    rw = jnp.maximum(rois[:, 2] - rois[:, 0], 1.0)
    rh = jnp.maximum(rois[:, 3] - rois[:, 1], 1.0)
    bin_w = rw / pw
    bin_h = rh / ph

    if pcfg.adaptive:
        from ..ops.roi_align import adaptive_axis_samples

        ys, wy = adaptive_axis_samples(rois[:, 1], bin_h, ph, s)
        xs, wx = adaptive_axis_samples(rois[:, 0], bin_w, pw, s)
    else:
        iy = (jnp.arange(ph * s) // s).astype(jnp.float32)
        sy = (jnp.arange(ph * s) % s).astype(jnp.float32)
        ys = rois[:, 1:2] + iy[None, :] * bin_h[:, None] + (sy[None, :] + 0.5) * (
            bin_h[:, None] / s
        )  # [R, ph*s]
        ix = (jnp.arange(pw * s) // s).astype(jnp.float32)
        sx = (jnp.arange(pw * s) % s).astype(jnp.float32)
        xs = rois[:, 0:1] + ix[None, :] * bin_w[:, None] + (sx[None, :] + 0.5) * (
            bin_w[:, None] / s
        )  # [R, pw*s]

    y = jnp.broadcast_to(ys[:, :, None], (r, ph * s, pw * s))
    x = jnp.broadcast_to(xs[:, None, :], (r, ph * s, pw * s))
    h_f = roi_h.astype(jnp.float32)[:, None, None]
    w_f = roi_wl.astype(jnp.float32)[:, None, None]

    outside = (y < -1.0) | (y > h_f) | (x < -1.0) | (x > w_f)
    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)
    h_i = roi_h[:, None, None]
    w_i = roi_wl[:, None, None]
    y_low = jnp.minimum(y.astype(jnp.int32), h_i - 1)
    x_low = jnp.minimum(x.astype(jnp.int32), w_i - 1)
    y_high = jnp.minimum(y_low + 1, h_i - 1)
    x_high = jnp.minimum(x_low + 1, w_i - 1)
    y = jnp.where(y_low >= h_i - 1, y_low.astype(y.dtype), y)
    x = jnp.where(x_low >= w_i - 1, x_low.astype(x.dtype), x)
    ly = y - y_low
    lx = x - x_low
    hy = 1.0 - ly
    hx = 1.0 - lx

    base = roi_off[:, None, None]

    def take(yy, xx):
        return flat[base + yy * w_i + xx]

    val = (
        (hy * hx)[..., None].astype(compute_dtype) * take(y_low, x_low)
        + (hy * lx)[..., None].astype(compute_dtype) * take(y_low, x_high)
        + (ly * hx)[..., None].astype(compute_dtype) * take(y_high, x_low)
        + (ly * lx)[..., None].astype(compute_dtype) * take(y_high, x_high)
    )
    val = jnp.where(outside[..., None], jnp.zeros((), compute_dtype), val)
    if pcfg.adaptive:
        wgt = (wy[:, :, None] * wx[:, None, :]).astype(compute_dtype)
        return (val * wgt[..., None]).reshape(r, ph, s, pw, s, c).sum(axis=(2, 4))
    out = val.reshape(r, ph, s, pw, s, c).mean(axis=(2, 4))
    return out


def make_pooler(cfg, head_name):
    head = getattr(cfg.MODEL, head_name)
    return PoolerConfig(
        head.POOLER_RESOLUTION, head.POOLER_SCALES, head.POOLER_SAMPLING_RATIO
    )
