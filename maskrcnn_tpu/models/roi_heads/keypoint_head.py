"""ROI keypoint head: extractor, predictor, heatmap targets, loss, decode.

Reference: maskrcnn_benchmark/modeling/roi_heads/keypoint_head/
  {keypoint_head.py:9-53, roi_keypoint_feature_extractors.py:11-51,
   roi_keypoint_predictors.py:8-38, loss.py:54-183, inference.py:12-126},
plus keypoints_to_heat_map (structures/keypoint.py:154-188).

TPU notes: heatmap targets are computed on-device with the exact
discretization (floor, boundary snap); decoding replaces the reference's
per-ROI cv2 cubic resize (inference.py:40-98, single-image only) with a
batched bilinear upsample + argmax that handles full batches.
"""

import jax
import jax.numpy as jnp
from jax import lax

from ..layers import conv2d, init_conv, relu
from ..poolers import multilevel_roi_align


def init_keypoint_feature_extractor(key, cfg, in_channels):
    layers = cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_LAYERS
    keys = jax.random.split(key, len(layers))
    convs = []
    cin = in_channels
    for i, cout in enumerate(layers):
        convs.append(
            {"conv": init_conv(keys[i], 3, 3, cin, cout, init="kaiming_normal_fanin")}
        )
        cin = cout
    return {"convs": convs}, cin


def apply_keypoint_feature_extractor(params, x, compute_dtype=jnp.bfloat16):
    for c in params["convs"]:
        x = relu(conv2d(x, c["conv"], padding=1, compute_dtype=compute_dtype))
    return x


def init_keypoint_predictor(key, cfg, in_channels):
    num_kp = cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_CLASSES
    # ConvTranspose2d(in, K, 4, stride 2, pad 1), kaiming fan_out
    fan_out = 4 * 4 * num_kp
    w = jnp.sqrt(2.0 / fan_out) * jax.random.normal(key, (4, 4, in_channels, num_kp))
    return {"kps_score_lowres": {"w": w.astype(jnp.float32), "b": jnp.zeros((num_kp,))}}


def _upsample2x_bilinear(x):
    """Exact 2x bilinear upsample, align_corners=False (the reference's
    F.interpolate(scale_factor=2), keypoint_head.py predictor): with
    src = (dst + 0.5) / 2 - 0.5, even outputs mix (prev, cur) at (1/4, 3/4)
    and odd outputs (cur, next) at (3/4, 1/4), edges clamped. Written as
    shift-adds (VPU elementwise in the compute dtype) instead of
    jax.image.resize, whose gather lowering is several times slower on the
    lane-padded [R, H, W, 17] layout."""

    def axis_up(v, axis):
        prev = jnp.concatenate(
            [lax.slice_in_dim(v, 0, 1, axis=axis),
             lax.slice_in_dim(v, 0, v.shape[axis] - 1, axis=axis)], axis=axis
        )
        nxt = jnp.concatenate(
            [lax.slice_in_dim(v, 1, v.shape[axis], axis=axis),
             lax.slice_in_dim(v, v.shape[axis] - 1, v.shape[axis], axis=axis)],
            axis=axis,
        )
        even = 0.25 * prev + 0.75 * v
        odd = 0.75 * v + 0.25 * nxt
        inter = jnp.stack([even, odd], axis=axis + 1)
        shape = list(v.shape)
        shape[axis] *= 2
        return inter.reshape(shape)

    return axis_up(axis_up(x, 1), 2)


def apply_keypoint_predictor(params, x, compute_dtype=jnp.bfloat16):
    from ..layers import conv_transpose2d

    x = conv_transpose2d(x, params["kps_score_lowres"], stride=2, compute_dtype=compute_dtype)
    return _upsample2x_bilinear(x)  # [R, 56, 56, K] logits


def init_keypoint_head(key, cfg, in_channels):
    k1, k2 = jax.random.split(key)
    fe, out = init_keypoint_feature_extractor(k1, cfg, in_channels)
    pred = init_keypoint_predictor(k2, cfg, out)
    return {"feature_extractor": fe, "predictor": pred}


def run_keypoint_head(params, features, boxes, batch_idx, pcfg, cfg,
                      compute_dtype=jnp.bfloat16, pooler_backend="gather"):
    x = multilevel_roi_align(features, boxes, batch_idx, pcfg, compute_dtype,
                             backend=pooler_backend)
    x = apply_keypoint_feature_extractor(params["feature_extractor"], x, compute_dtype)
    return apply_keypoint_predictor(params["predictor"], x, compute_dtype)


# -- targets + loss -------------------------------------------------------------


def keypoints_to_heatmap(keypoints, rois, heatmap_size):
    """Exact port of structures/keypoint.py:154-188 semantics.
    keypoints [R, K, 3]; rois [R, 4]. Returns (lin_idx [R, K], valid [R, K])."""
    offset_x = rois[:, 0:1]
    offset_y = rois[:, 1:2]
    scale_x = heatmap_size / jnp.maximum(rois[:, 2:3] - rois[:, 0:1], 1e-6)
    scale_y = heatmap_size / jnp.maximum(rois[:, 3:4] - rois[:, 1:2], 1e-6)

    x = keypoints[..., 0]
    y = keypoints[..., 1]
    x_boundary = x == rois[:, 2:3]
    y_boundary = y == rois[:, 3:4]

    xi = jnp.floor((x - offset_x) * scale_x).astype(jnp.int32)
    yi = jnp.floor((y - offset_y) * scale_y).astype(jnp.int32)
    xi = jnp.where(x_boundary, heatmap_size - 1, xi)
    yi = jnp.where(y_boundary, heatmap_size - 1, yi)

    valid_loc = (xi >= 0) & (yi >= 0) & (xi < heatmap_size) & (yi < heatmap_size)
    vis = keypoints[..., 2] > 0
    valid = valid_loc & vis
    lin = (yi * heatmap_size + xi) * valid
    return lin, valid


def keypoint_head_loss(kp_logits, keypoints, rois, roi_valid):
    """kp_logits [R, H, H, K]; keypoints [R, K, 3] gt of the matched
    instance; rois [R, 4]; roi_valid [R]. CE over H*H bins at visible
    keypoints, mean over valid (loss.py:146-166)."""
    r, h, _, k = kp_logits.shape
    targets, valid = keypoints_to_heatmap(keypoints, rois, h)
    valid = valid & roi_valid[:, None]
    # spatial log-softmax WITHOUT transposing K inward: reduce over the two
    # spatial axes in place (the [R, H, H, K] -> [R, K, H*H] relayout was a
    # 200 MB copy per step), then one tiny gather per (roi, keypoint)
    logits = kp_logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits.reshape(r, h * h, k), axis=1)  # [R, K]
    picked = jnp.take_along_axis(
        logits.reshape(r, h * h, k), targets[:, None, :], axis=1
    )[:, 0, :]  # [R, K]
    nll = lse - picked
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll * valid) / denom


def keypoints_within_box_filter(keypoints, gt_boxes):
    """is_visible per instance: any keypoint visible AND inside the gt box
    (loss.py:118-125 _within_box semantics)."""
    pts = keypoints[..., :2]
    within = (
        (pts[..., 0] >= gt_boxes[..., 0:1])
        & (pts[..., 0] <= gt_boxes[..., 2:3])
        & (pts[..., 1] >= gt_boxes[..., 1:2])
        & (pts[..., 1] <= gt_boxes[..., 3:4])
    )
    vis = keypoints[..., 2] > 0
    return jnp.sum(within & vis, axis=-1) > 0


# -- decode (inference) -----------------------------------------------------------


def heatmaps_to_keypoints_exact(maps, rois):
    """Host-side decode, bit-matching the reference's
    keypoint_head/inference.py:40-98: per ROI, resize the [H, H, K] heatmap
    to the ceil'd roi size with cv2 bicubic, argmax per keypoint, and map
    the discrete maximum back with the Heckbert +0.5 convention.

    maps: [R, H, H, K] float32 numpy (NHWC); rois: [R, 4] numpy.
    Returns [R, K, 4] (x, y, 1, logit-at-max) in image coordinates.
    """
    import cv2
    import numpy as onp

    maps = onp.asarray(maps, onp.float32)
    rois = onp.asarray(rois, onp.float32)
    r, _, _, k = maps.shape
    out = onp.zeros((r, k, 4), onp.float32)
    widths = onp.maximum(rois[:, 2] - rois[:, 0], 1)
    heights = onp.maximum(rois[:, 3] - rois[:, 1], 1)
    wc = onp.ceil(widths).astype(int)
    hc = onp.ceil(heights).astype(int)
    for i in range(r):
        roi_map = cv2.resize(
            maps[i], (wc[i], hc[i]), interpolation=cv2.INTER_CUBIC
        )
        if roi_map.ndim == 2:
            roi_map = roi_map[:, :, None]
        w = roi_map.shape[1]
        flat = roi_map.reshape(-1, k)
        pos = flat.argmax(axis=0)
        x_int = pos % w
        y_int = (pos - x_int) // w
        out[i, :, 0] = (x_int + 0.5) * (widths[i] / wc[i]) + rois[i, 0]
        out[i, :, 1] = (y_int + 0.5) * (heights[i] / hc[i]) + rois[i, 1]
        out[i, :, 2] = 1.0
        out[i, :, 3] = flat[pos, onp.arange(k)]
    return out


def heatmaps_to_keypoints(kp_logits, rois):
    """Jit-safe on-device approximation (fixed 4x bilinear upsample +
    argmax) of the exact host decode above. Same column layout as the exact
    decoder — (x, y, 1, logit-at-max) — so consumers (e.g. the demo's
    logit-scale joint threshold) behave identically whichever decoder ran.

    kp_logits [R, H, H, K]; rois [R, 4]. Returns [R, K, 4] in image coords.
    """
    r, h, _, k = kp_logits.shape
    up = 4  # upsample factor approximating the per-roi resize
    logits = jax.image.resize(
        kp_logits.astype(jnp.float32), (r, h * up, h * up, k), "bilinear"
    )
    hu = h * up
    flat = logits.transpose(0, 3, 1, 2).reshape(r, k, hu * hu)
    idx = jnp.argmax(flat, axis=-1)
    max_logit = jnp.max(flat, axis=-1)
    yi = (idx // hu).astype(jnp.float32)
    xi = (idx % hu).astype(jnp.float32)

    x1, y1 = rois[:, 0:1], rois[:, 1:2]
    w = jnp.maximum(rois[:, 2:3] - rois[:, 0:1], 1.0)
    hgt = jnp.maximum(rois[:, 3:4] - rois[:, 1:2], 1.0)
    x = x1 + (xi + 0.5) * (w / hu)
    y = y1 + (yi + 0.5) * (hgt / hu)
    return jnp.stack(
        [x, y, jnp.ones_like(max_logit), max_logit], axis=-1
    )
