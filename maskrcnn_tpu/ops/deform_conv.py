"""Deformable convolution v1/v2 and deformable PS-ROI pooling (XLA-native).

The reference implements these as CUDA im2col+GEMM kernels
(reference: csrc/cuda/deform_conv_cuda.cu:158-691,
deform_conv_kernel_cuda.cu, deform_pool_kernel_cuda.cu). On TPU the same
computation is expressed as a *deformed gather-im2col*: for every output
position and kernel tap, bilinearly sample the input at
(base tap position + learned offset), assemble [.., K*K*C] columns, and
contract with the flattened kernel on the MXU. XLA autodiff provides the
three backward passes (input-grad = scatter, offset-grad via the bilinear
weights' derivative, weight-grad = GEMM).

Modulated (v2) multiplies each sampled tap by a learned sigmoid mask.
Semantics match torchvision/reference: samples fully outside the feature
map contribute 0; coordinates are NOT half-pixel shifted.
"""

import jax.numpy as jnp


def _bilinear_sample_nhwc(x, y, xq):
    """x: [B, H, W, C]; y/xq: [B, OH, OW, T] float coords.
    Returns [B, OH, OW, T, C]; out-of-range (beyond [-1, H]) -> 0."""
    b, h, w, c = x.shape
    outside = (y <= -1.0) | (y >= h) | (xq <= -1.0) | (xq >= w)
    y0 = jnp.floor(y)
    x0 = jnp.floor(xq)
    wy = y - y0
    wx = xq - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        flat = x.reshape(b, h * w, c)
        lin = yc * w + xc  # [B, OH, OW, T]
        sh = lin.shape
        out = jnp.take_along_axis(
            flat, lin.reshape(b, -1, 1), axis=1
        ).reshape(*sh, c)
        return out * valid[..., None]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    wy_ = wy[..., None]
    wx_ = wx[..., None]
    val = (
        v00 * (1 - wy_) * (1 - wx_)
        + v01 * (1 - wy_) * wx_
        + v10 * wy_ * (1 - wx_)
        + v11 * wy_ * wx_
    )
    return jnp.where(outside[..., None], 0.0, val)


def deform_conv2d(
    x,  # [B, H, W, Cin]
    offsets,  # [B, OH, OW, 2*G*K*K] (y, x per tap, deformable group major)
    weight,  # [K, K, Cin // groups, Cout]
    mask=None,  # [B, OH, OW, G*K*K] modulation (v2), pre-sigmoid NOT applied
    stride=1,
    padding=1,
    dilation=1,
    groups=1,
    deformable_groups=1,
    compute_dtype=jnp.bfloat16,
):
    """Returns [B, OH, OW, Cout]."""
    b, h, w, cin = x.shape
    k = weight.shape[0]
    g = deformable_groups
    oh = (h + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    ow = (w + 2 * padding - dilation * (k - 1) - 1) // stride + 1

    oy = jnp.arange(oh, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(ow, dtype=jnp.float32) * stride - padding
    ky = jnp.arange(k, dtype=jnp.float32) * dilation
    kx = jnp.arange(k, dtype=jnp.float32) * dilation
    # base tap positions [OH, OW, K*K]
    base_y = (oy[:, None, None, None] + ky[None, None, :, None]).reshape(oh, 1, k, 1)
    base_x = (ox[None, :, None, None] + kx[None, None, None, :]).reshape(1, ow, 1, k)
    base_y = jnp.broadcast_to(base_y, (oh, ow, k, k)).reshape(oh, ow, k * k)
    base_x = jnp.broadcast_to(base_x, (oh, ow, k, k)).reshape(oh, ow, k * k)

    off = offsets.astype(jnp.float32).reshape(b, oh, ow, g, k * k, 2)
    y = base_y[None, :, :, None, :] + off[..., 0]  # [B, OH, OW, G, K*K]
    xq = base_x[None, :, :, None, :] + off[..., 1]

    cg = cin // g  # channels per deformable group
    outs = []
    for gi in range(g):
        xs = x[..., gi * cg:(gi + 1) * cg].astype(jnp.float32)
        sampled = _bilinear_sample_nhwc(xs, y[:, :, :, gi], xq[:, :, :, gi])
        # [B, OH, OW, K*K, cg]
        if mask is not None:
            m = mask.astype(jnp.float32).reshape(b, oh, ow, g, k * k)
            sampled = sampled * m[:, :, :, gi, :, None]
        outs.append(sampled)
    cols = jnp.concatenate(outs, axis=-1) if g > 1 else outs[0]
    # [B, OH, OW, K*K, Cin] -> contract with weight [K*K*Cin/groups, Cout]
    cols = cols.astype(compute_dtype)
    wmat = weight.astype(compute_dtype).reshape(k * k, -1, weight.shape[-1])
    if groups == 1:
        out = jnp.einsum("bhwtc,tco->bhwo", cols, wmat)
    else:
        cout = weight.shape[-1]
        cg2 = cin // groups
        og = cout // groups
        parts = []
        for gi in range(groups):
            part = jnp.einsum(
                "bhwtc,tco->bhwo",
                cols[..., gi * cg2:(gi + 1) * cg2],
                wmat[:, :, gi * og:(gi + 1) * og],
            )
            parts.append(part)
        out = jnp.concatenate(parts, axis=-1)
    return out


def deform_psroi_pool(
    features,  # [B, H, W, C]
    rois,  # [R, 4] xyxy image coords
    roi_batch_idx,  # [R]
    offsets,  # [R, P, P, 2] or None (no_trans)
    spatial_scale,
    out_size,
    sample_per_part=4,
    trans_std=0.1,
):
    """Deformable position-sensitive ROI pooling (reference
    csrc/cuda/deform_pool_kernel_cuda.cu): each output bin samples a
    sub-grid shifted by the learned (normalized) offset, averaging valid
    samples. Channel-sharing variant (no_trans when offsets is None)."""
    b, h, w, c = features.shape
    r = rois.shape[0]
    p = out_size

    boxes = rois.astype(jnp.float32) * spatial_scale
    # reference: round then +/- 0.5 enlarge
    x1 = jnp.round(boxes[:, 0]) - 0.5
    y1 = jnp.round(boxes[:, 1]) - 0.5
    x2 = jnp.round(boxes[:, 2]) + 0.5
    y2 = jnp.round(boxes[:, 3]) + 0.5
    rw = jnp.maximum(x2 - x1, 0.1)
    rh = jnp.maximum(y2 - y1, 0.1)
    bin_w = rw / p
    bin_h = rh / p

    s = sample_per_part
    iy = (jnp.arange(p * s) // s).astype(jnp.float32)
    sy = (jnp.arange(p * s) % s).astype(jnp.float32)
    ys = y1[:, None] + iy[None, :] * bin_h[:, None] + (sy[None, :] + 0.5) * (
        bin_h[:, None] / s
    )
    ix = (jnp.arange(p * s) // s).astype(jnp.float32)
    sx = (jnp.arange(p * s) % s).astype(jnp.float32)
    xs = x1[:, None] + ix[None, :] * bin_w[:, None] + (sx[None, :] + 0.5) * (
        bin_w[:, None] / s
    )
    # Build the full sample grid [R, P*S(y), P*S(x)]
    yq = jnp.broadcast_to(ys[:, :, None], (r, p * s, p * s))
    xq = jnp.broadcast_to(xs[:, None, :], (r, p * s, p * s))
    if offsets is not None:
        dy = (offsets[..., 0] * trans_std * rh[:, None, None])
        dx = (offsets[..., 1] * trans_std * rw[:, None, None])
        dy = jnp.repeat(jnp.repeat(dy, s, axis=1), s, axis=2)
        dx = jnp.repeat(jnp.repeat(dx, s, axis=1), s, axis=2)
        yq = yq + dy
        xq = xq + dx

    flat = features.reshape(b * h * w, c)
    base = roi_batch_idx[:, None, None] * (h * w)
    outside = (yq < -0.5) | (yq > h - 0.5) | (xq < -0.5) | (xq > w - 0.5)
    yc = jnp.clip(yq, 0.0, h - 1.0)
    xc = jnp.clip(xq, 0.0, w - 1.0)
    y0 = jnp.floor(yc).astype(jnp.int32)
    x0 = jnp.floor(xc).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, h - 1)
    x1i = jnp.minimum(x0 + 1, w - 1)
    wy = yc - y0
    wx = xc - x0

    def take(yy, xx):
        return flat[base + yy * w + xx]

    val = (
        (1 - wy)[..., None] * (1 - wx)[..., None] * take(y0, x0)
        + (1 - wy)[..., None] * wx[..., None] * take(y0, x1i)
        + wy[..., None] * (1 - wx)[..., None] * take(y1i, x0)
        + wy[..., None] * wx[..., None] * take(y1i, x1i)
    )
    val = jnp.where(outside[..., None], 0.0, val)
    valid = (~outside).astype(jnp.float32)[..., None]
    val = val.reshape(r, p, s, p, s, c)
    valid = valid.reshape(r, p, s, p, s, 1)
    return val.sum(axis=(2, 4)) / jnp.maximum(valid.sum(axis=(2, 4)), 1.0)
