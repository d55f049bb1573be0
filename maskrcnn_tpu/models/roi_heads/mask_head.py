"""ROI mask head: extractors, predictor, on-device target projection, loss.

Reference: maskrcnn_benchmark/modeling/roi_heads/mask_head/
  {mask_head.py:13-84, roi_mask_feature_extractors.py:17-74,
   roi_mask_predictors.py:11-58, loss.py:11-142, inference.py:12-209}.

Key TPU redesign (SURVEY.md §7 hard-part #1): the reference rasterizes gt
polygons per-proposal on CPU every step (loss.py:31-42). Here each gt
instance is rasterized ONCE in the input pipeline to a fixed-size patch
aligned to its gt box; at train time the target for a proposal is produced
on-device by bilinearly resampling the matched instance's patch into the
proposal's crop frame (project_gt_masks below). The mask batch is a fixed
number of positive ROIs (padded).
"""

import jax
import jax.numpy as jnp

from ..layers import conv2d, conv_transpose2d, init_conv, relu
from ..poolers import multilevel_roi_align
from ..resnet import apply_res5_head, init_res5_head, make_res5_head_config

# -- feature extractor / predictor ----------------------------------------------


def init_mask_feature_extractor(key, cfg, in_channels):
    name = cfg.MODEL.ROI_MASK_HEAD.FEATURE_EXTRACTOR
    if name == "FBNet.roi_head_mask":
        from ..fbnet import init_fbnet_head

        return init_fbnet_head(key, cfg, in_channels, which="mask")
    if name == "MaskRCNNFPNFeatureExtractor":
        layers = cfg.MODEL.ROI_MASK_HEAD.CONV_LAYERS
        keys = jax.random.split(key, len(layers))
        convs = []
        cin = in_channels
        for i, cout in enumerate(layers):
            convs.append(
                {"conv": init_conv(keys[i], 3, 3, cin, cout, init="kaiming_normal_fanin")}
            )
            cin = cout
        return {"convs": convs}, cin
    if name == "ResNet50Conv5ROIFeatureExtractor":
        hc = make_res5_head_config(cfg)
        return {"head": init_res5_head(key, hc)}, hc["out"]
    raise ValueError(name)


def apply_mask_feature_extractor(params, x, cfg, compute_dtype=jnp.bfloat16):
    name = cfg.MODEL.ROI_MASK_HEAD.FEATURE_EXTRACTOR
    if name == "FBNet.roi_head_mask":
        from ..fbnet import apply_fbnet_head

        return apply_fbnet_head(params, cfg, x, which="mask", compute_dtype=compute_dtype)
    if name == "MaskRCNNFPNFeatureExtractor":
        dilation = cfg.MODEL.ROI_MASK_HEAD.DILATION
        for c in params["convs"]:
            x = relu(
                conv2d(x, c["conv"], padding=dilation, dilation=dilation,
                       compute_dtype=compute_dtype)
            )
        return x
    if name == "ResNet50Conv5ROIFeatureExtractor":
        hc = make_res5_head_config(cfg)
        return apply_res5_head(params["head"], x, hc, compute_dtype)
    raise ValueError(name)


def init_mask_predictor(key, cfg, in_channels):
    name = cfg.MODEL.ROI_MASK_HEAD.PREDICTOR
    num_classes = cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES
    if name == "MaskRCNNC4Predictor":
        dim_reduced = cfg.MODEL.ROI_MASK_HEAD.CONV_LAYERS[-1]
        k1, k2 = jax.random.split(key)
        return {
            # ConvTranspose2d(in, dim_reduced, 2, 2); HWIO with I=in
            "conv5_mask": {
                "w": jax.random.normal(k1, (2, 2, in_channels, dim_reduced)) * 0.001,
                "b": jnp.zeros((dim_reduced,)),
            },
            "mask_fcn_logits": init_conv(
                k2, 1, 1, dim_reduced, num_classes, init="kaiming_normal_fanin"
            ),
        }
    if name == "MaskRCNNConv1x1Predictor":
        return {
            "mask_fcn_logits": init_conv(
                key, 1, 1, in_channels, num_classes, init="kaiming_normal_fanin"
            )
        }
    raise ValueError(name)


def apply_mask_predictor(params, x, cfg, compute_dtype=jnp.bfloat16):
    if cfg.MODEL.ROI_MASK_HEAD.PREDICTOR == "MaskRCNNC4Predictor":
        x = relu(conv_transpose2d(x, params["conv5_mask"], stride=2, compute_dtype=compute_dtype))
    return conv2d(x, params["mask_fcn_logits"], padding=0, compute_dtype=compute_dtype).astype(
        jnp.float32
    )


def apply_mask_predictor_at_class(params, x, labels, cfg,
                                  compute_dtype=jnp.bfloat16):
    """Training-path predictor: logits ONLY at each ROI's gt class.

    The loss consumes one class channel per ROI, so materializing the full
    [R, M, M, C] map (and its [R, M, M, C] f32 zeros+scatter in backward —
    ~260 MB at R=1024, C=81) is wasted HBM traffic. Gathering the 1x1-conv
    weight column per ROI first makes the predictor a per-ROI matvec with a
    [R, M, M] output; same math as apply_mask_predictor + gather-at-class
    (reference computes the full map then indexes, mask_head/loss.py:139).
    Returns [R, M, M] float32.
    """
    if cfg.MODEL.ROI_MASK_HEAD.PREDICTOR == "MaskRCNNC4Predictor":
        x = relu(conv_transpose2d(x, params["conv5_mask"], stride=2,
                                  compute_dtype=compute_dtype))
    p = params["mask_fcn_logits"]
    w = p["w"][0, 0]  # [D, C]
    c = w.shape[1]
    safe = jnp.clip(labels, 0, c - 1)
    wl = jnp.take(w, safe, axis=1).T.astype(compute_dtype)  # [R, D]
    out = jnp.einsum("rhwd,rd->rhw", x.astype(compute_dtype), wl)
    if "b" in p:
        out = out + jnp.take(p["b"], safe).astype(compute_dtype)[:, None, None]
    return out.astype(jnp.float32)


def init_mask_head(key, cfg, in_channels):
    k1, k2 = jax.random.split(key)
    fe, out = init_mask_feature_extractor(k1, cfg, in_channels)
    pred = init_mask_predictor(k2, cfg, out)
    return {"feature_extractor": fe, "predictor": pred}


def run_mask_head(params, features, boxes, batch_idx, pcfg, cfg,
                  compute_dtype=jnp.bfloat16, pooler_backend="gather"):
    """boxes [R, 4] -> mask logits [R, M, M, num_classes]."""
    x = multilevel_roi_align(features, boxes, batch_idx, pcfg, compute_dtype,
                             backend=pooler_backend)
    x = apply_mask_feature_extractor(params["feature_extractor"], x, cfg, compute_dtype)
    return apply_mask_predictor(params["predictor"], x, cfg, compute_dtype)


# -- target projection + loss -------------------------------------------------------


def project_gt_masks(gt_patches, gt_boxes, proposal_boxes, out_size):
    """Resample per-instance gt mask patches into proposal crop frames.

    Args:
      gt_patches: [R, S, S] float — the matched instance's mask, axis-aligned
        to its gt box (patch pixel (i, j) center = gt corner + ((j+.5)/S*gw,
        (i+.5)/S*gh), gw = x2-x1 as in PolygonInstance.crop).
      gt_boxes: [R, 4] matched gt box per proposal (image coords).
      proposal_boxes: [R, 4].
      out_size: M (e.g. 28).

    Returns [R, M, M] float targets in [0, 1] (binarize at 0.5 for BCE, the
    bilinear value is already a good soft target).
    """
    r, s, _ = gt_patches.shape
    m = out_size
    gx1, gy1, gx2, gy2 = (gt_boxes[:, i] for i in range(4))
    gw = jnp.maximum(gx2 - gx1, 1.0)
    gh = jnp.maximum(gy2 - gy1, 1.0)
    px1, py1, px2, py2 = (proposal_boxes[:, i] for i in range(4))
    pw = jnp.maximum(px2 - px1, 1.0)
    ph = jnp.maximum(py2 - py1, 1.0)

    # output pixel centers in image coords
    u = (jnp.arange(m, dtype=jnp.float32) + 0.5) / m  # [M]
    x_img = px1[:, None] + u[None, :] * pw[:, None]  # [R, M]
    y_img = py1[:, None] + u[None, :] * ph[:, None]  # [R, M]
    # to patch pixel coords
    x_p = (x_img - gx1[:, None]) * (s / gw[:, None]) - 0.5
    y_p = (y_img - gy1[:, None]) * (s / gh[:, None]) - 0.5

    def sample_separable(patches, yq, xq):
        # bilinear, separable gather: [R, S, S] sampled at yq [R, M], xq [R, M]
        y0 = jnp.floor(yq).astype(jnp.int32)
        x0 = jnp.floor(xq).astype(jnp.int32)
        wy = yq - y0
        wx = xq - x0
        y0c = jnp.clip(y0, 0, s - 1)
        y1c = jnp.clip(y0 + 1, 0, s - 1)
        x0c = jnp.clip(x0, 0, s - 1)
        x1c = jnp.clip(x0 + 1, 0, s - 1)
        in_y0 = (y0 >= 0) & (y0 <= s - 1)
        in_y1 = (y0 + 1 >= 0) & (y0 + 1 <= s - 1)
        in_x0 = (x0 >= 0) & (x0 <= s - 1)
        in_x1 = (x0 + 1 >= 0) & (x0 + 1 <= s - 1)

        def g(yi, xi):
            # [R, M(y), M(x)]
            rows = jnp.take_along_axis(patches, yi[:, :, None], axis=1)  # [R,M,S]
            return jnp.take_along_axis(rows, xi[:, None, :], axis=2)  # [R,M,M]

        v00 = g(y0c, x0c) * (in_y0[:, :, None] & in_x0[:, None, :])
        v01 = g(y0c, x1c) * (in_y0[:, :, None] & in_x1[:, None, :])
        v10 = g(y1c, x0c) * (in_y1[:, :, None] & in_x0[:, None, :])
        v11 = g(y1c, x1c) * (in_y1[:, :, None] & in_x1[:, None, :])
        wy_ = wy[:, :, None]
        wx_ = wx[:, None, :]
        return (
            v00 * (1 - wy_) * (1 - wx_)
            + v01 * (1 - wy_) * wx_
            + v10 * wy_ * (1 - wx_)
            + v11 * wy_ * wx_
        )

    return sample_separable(gt_patches.astype(jnp.float32), y_p, x_p)


def mask_head_loss(mask_logits, mask_targets, labels, valid):
    """mask_logits [R, M, M, C]; targets [R, M, M] in {0,1}; labels [R];
    valid [R] (positive + real). BCE at the gt-class channel, mean over
    valid elements (reference loss.py:109-142)."""
    r, m, _, c = mask_logits.shape
    safe = jnp.clip(labels, 0, c - 1)
    picked = jnp.take_along_axis(
        mask_logits, safe[:, None, None, None], axis=3
    )[..., 0]
    return mask_head_loss_picked(picked, mask_targets, valid)


def mask_head_loss_picked(picked, mask_targets, valid):
    """BCE given pre-gathered gt-class logits [R, M, M] (see
    apply_mask_predictor_at_class); targets [R, M, M]; valid [R]."""
    m = picked.shape[1]
    t = (mask_targets >= 0.5).astype(jnp.float32)
    per = jax.nn.softplus(picked) - picked * t  # BCE with logits
    w = valid.astype(jnp.float32)[:, None, None]
    denom = jnp.maximum(jnp.sum(w) * m * m, 1.0)
    return jnp.sum(per * w) / denom


def select_positive_rois(targets, k_mask, rng=None):
    """From the box-head sampled ROI batch, take a fixed number of positive
    ROIs for the mask/keypoint heads. Returns (idx [B, Km], valid [B, Km])."""
    is_pos = targets["is_pos"] & targets["valid"]
    b, k = is_pos.shape
    # positives were placed first by sample_topk_indices; a stable top-k of
    # the mask keeps them in order
    score = is_pos.astype(jnp.float32) - jnp.arange(k)[None, :] * 1e-6
    top, idx = jax.lax.top_k(score, min(k_mask, k))
    valid = top > 0.5
    return idx, valid
