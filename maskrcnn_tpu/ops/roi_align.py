"""ROIAlign / ROIPool as gather-based XLA ops (NHWC).

The reference implements these as CUDA kernels with hand-written backwards
(reference: csrc/cuda/ROIAlign_cuda.cu:65-346, csrc/cuda/ROIPool_cuda.cu).
Here they are expressed as vectorized bilinear gathers over a fused
(batch*H*W, C) view, so XLA autodiff provides the backward (scatter-add) and
the MXU-heavy head convs that follow stay fused in the same program. A Pallas
kernel (ops/pallas/roi_align_kernel.py) covers the hot configuration.

Semantics match the reference's legacy aligned=False behaviour:
  * coords scaled by spatial_scale with NO half-pixel (-0.5) shift
  * roi width/height clamped to >= 1 in feature coords
  * bilinear samples outside [-1, H] are zero; inside coords clamped to edge
  * sample grid: sampling_ratio x sampling_ratio per bin; the reference's
    sampling_ratio=0 "adaptive ceil(roi/bin)" mode (ROIAlign_cuda.cu:30-34,
    per-axis grid = ceil(roi_size / pooled_size)) is realized EXACTLY with
    fixed shapes: a static superset of adaptive_max samples per bin per
    axis, where sample k of a bin carries weight 1/n if k < n (the ROI's
    true grid count) and 0 otherwise, and positions are computed from the
    per-ROI n. Exact whenever n <= adaptive_max; with the reference's
    800/1333 input sizes the largest possible C4 grid is
    ceil(1333/16/14) = 6 < 8.
"""

import jax.numpy as jnp


def _bilinear_gather(flat_features, h, w, batch_idx, y, x):
    """Bilinear sample from flat_features [(B*H*W), C].

    batch_idx, y, x: [...] float coords in feature space.
    Returns [..., C]. Samples with y or x outside [-1, H/W] return 0;
    otherwise coords are clamped to the valid edge (reference
    ROIAlign_cuda.cu:16-60 bilinear_interpolate).
    """
    outside = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)

    y_low = jnp.minimum(y.astype(jnp.int32), h - 1)
    x_low = jnp.minimum(x.astype(jnp.int32), w - 1)
    y_high = jnp.minimum(y_low + 1, h - 1)
    x_high = jnp.minimum(x_low + 1, w - 1)
    # reference: if (y_low >= height-1) y = y_low  (degenerate cell)
    y = jnp.where(y_low >= h - 1, y_low.astype(y.dtype), y)
    x = jnp.where(x_low >= w - 1, x_low.astype(x.dtype), x)

    ly = y - y_low
    lx = x - x_low
    hy = 1.0 - ly
    hx = 1.0 - lx

    base = batch_idx * (h * w)

    def take(yy, xx):
        return flat_features[base + yy * w + xx]  # [..., C]

    val = (
        (hy * hx)[..., None] * take(y_low, x_low)
        + (hy * lx)[..., None] * take(y_low, x_high)
        + (ly * hx)[..., None] * take(y_high, x_low)
        + (ly * lx)[..., None] * take(y_high, x_high)
    )
    return jnp.where(outside[..., None], 0.0, val)


def adaptive_axis_samples(origin, bin_sz, p, s_max):
    """Per-axis sample positions + weights for the adaptive grid.

    Reference ROIAlign_cuda.cu:30-34: grid count n = ceil(roi_size / p)
    per axis. With a static s_max-sample superset, sample k of a bin sits
    at the grid-n position (k + .5) * bin/n and weighs 1/n for k < n, 0
    otherwise — bit-exact to the dynamic grid for every n <= s_max.

    origin: [K] roi start (feature coords); bin_sz: [K].
    Returns pos [K, p*s_max], wt [K, p*s_max].
    """
    n = jnp.clip(jnp.ceil(bin_sz), 1.0, float(s_max))  # [K]
    j = jnp.arange(p * s_max)
    binidx = (j // s_max).astype(jnp.float32)
    k = (j % s_max).astype(jnp.float32)
    pos = origin[:, None] + binidx[None] * bin_sz[:, None] + (
        k[None] + 0.5
    ) * (bin_sz[:, None] / n[:, None])
    wt = (k[None] < n[:, None]).astype(jnp.float32) / n[:, None]
    return pos, wt


def roi_align(
    features,  # [B, H, W, C]
    rois,  # [K, 4] xyxy in image coords
    roi_batch_idx,  # [K] int32
    output_size,  # int or (ph, pw)
    spatial_scale,
    sampling_ratio=2,
    adaptive_max=8,
):
    """Returns [K, ph, pw, C] average-pooled bilinear samples per ROI.

    sampling_ratio=0 selects the reference's adaptive per-ROI grid
    (exact up to adaptive_max samples per bin per axis)."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph, pw = output_size
    adaptive = int(sampling_ratio) == 0
    s = int(adaptive_max) if adaptive else max(int(sampling_ratio), 1)
    b, h, w, c = features.shape
    k = rois.shape[0]

    rois = rois.astype(jnp.float32) * spatial_scale
    roi_w = jnp.maximum(rois[:, 2] - rois[:, 0], 1.0)  # [K]
    roi_h = jnp.maximum(rois[:, 3] - rois[:, 1], 1.0)
    bin_w = roi_w / pw
    bin_h = roi_h / ph

    if adaptive:
        ys, wy = adaptive_axis_samples(rois[:, 1], bin_h, ph, s)
        xs, wx = adaptive_axis_samples(rois[:, 0], bin_w, pw, s)
    else:
        # Separable sample coordinates: ys [K, ph*s], xs [K, pw*s]
        iy = (jnp.arange(ph * s) // s).astype(jnp.float32)  # bin index per row
        sy = (jnp.arange(ph * s) % s).astype(jnp.float32)
        ys = rois[:, 1:2] + iy[None, :] * bin_h[:, None] + (sy[None, :] + 0.5) * (
            bin_h[:, None] / s
        )
        ix = (jnp.arange(pw * s) // s).astype(jnp.float32)
        sx = (jnp.arange(pw * s) % s).astype(jnp.float32)
        xs = rois[:, 0:1] + ix[None, :] * bin_w[:, None] + (sx[None, :] + 0.5) * (
            bin_w[:, None] / s
        )

    yy = jnp.broadcast_to(ys[:, :, None], (k, ph * s, pw * s))
    xx = jnp.broadcast_to(xs[:, None, :], (k, ph * s, pw * s))
    bb = jnp.broadcast_to(roi_batch_idx[:, None, None], (k, ph * s, pw * s))

    flat = features.reshape(b * h * w, c)
    samples = _bilinear_gather(flat, h, w, bb, yy, xx)  # [K, ph*s, pw*s, C]
    if adaptive:
        wgt = wy[:, :, None] * wx[:, None, :]  # [K, ph*s, pw*s]
        out = (samples * wgt[..., None]).reshape(k, ph, s, pw, s, c).sum(
            axis=(2, 4)
        )
    else:
        # Average the s x s samples in each bin.
        out = samples.reshape(k, ph, s, pw, s, c).mean(axis=(2, 4))
    return out


def roi_pool(
    features,  # [B, H, W, C]
    rois,  # [K, 4]
    roi_batch_idx,  # [K]
    output_size,
    spatial_scale,
):
    """Max-pool ROIPool (reference csrc/cuda/ROIPool_cuda.cu:17-79):
    integer-rounded roi, bins cover [floor, ceil) cells, empty bins -> 0."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph, pw = output_size
    b, h, w, c = features.shape
    k = rois.shape[0]

    r = jnp.round(rois.astype(jnp.float32) * spatial_scale)
    x1, y1 = r[:, 0], r[:, 1]
    roi_w = jnp.maximum(r[:, 2] - x1 + 1.0, 1.0)
    roi_h = jnp.maximum(r[:, 3] - y1 + 1.0, 1.0)
    bin_w = roi_w / pw
    bin_h = roi_h / ph

    # Static max bin extent: enumerate every integer cell a bin could cover
    # (bounded by the feature size) and mask cells past the bin end.
    cap_h = -(-h // ph) + 1
    cap_w = -(-w // pw) + 1

    py = jnp.arange(ph, dtype=jnp.float32)
    px = jnp.arange(pw, dtype=jnp.float32)
    hstart = jnp.floor(py[None, :, None] * bin_h[:, None, None]) + y1[:, None, None]
    hend = jnp.ceil((py[None, :, None] + 1) * bin_h[:, None, None]) + y1[:, None, None]
    wstart = jnp.floor(px[None, :, None] * bin_w[:, None, None]) + x1[:, None, None]
    wend = jnp.ceil((px[None, :, None] + 1) * bin_w[:, None, None]) + x1[:, None, None]

    dy = jnp.arange(cap_h, dtype=jnp.float32)
    dx = jnp.arange(cap_w, dtype=jnp.float32)
    ys = hstart[..., :] + dy  # [K, ph, 1] + [cap_h] -> [K, ph, cap_h]
    xs = wstart[..., :] + dx
    ys_valid = (ys < hend) & (ys >= 0) & (ys < h)
    xs_valid = (xs < wend) & (xs >= 0) & (xs < w)

    yi = jnp.clip(ys, 0, h - 1).astype(jnp.int32)  # [K, ph, cap_h]
    xi = jnp.clip(xs, 0, w - 1).astype(jnp.int32)  # [K, pw, cap_w]

    flat = features.reshape(b * h * w, c)
    base = (roi_batch_idx * (h * w))[:, None, None, None, None]
    lin = base + yi[:, :, None, :, None] * w + xi[:, None, :, None, :]
    vals = flat[lin]  # [K, ph, pw, cap_h, cap_w, C]
    valid = (
        ys_valid[:, :, None, :, None] & xs_valid[:, None, :, None, :]
    )[..., None]
    neg = jnp.asarray(-3.4e38, vals.dtype)
    vals = jnp.where(valid, vals, neg)
    out = jnp.max(vals, axis=(3, 4))
    any_valid = jnp.any(valid, axis=(3, 4))
    return jnp.where(any_valid, out, 0.0)
