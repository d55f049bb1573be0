"""ROI box head: feature extractors, predictors, loss, inference.

Reference: maskrcnn_benchmark/modeling/roi_heads/box_head/
  {box_head.py, roi_box_feature_extractors.py:14-144,
   roi_box_predictors.py:7-57, loss.py:15-193, inference.py:12-172}.

TPU redesign: the train-time subsample keeps a fixed 512-ROI batch per
image (random-priority top-k); inference decodes every class at once and
runs per-class NMS as a vmap over class lanes (the reference loops classes
in python), producing padded [B, DETECTIONS_PER_IMG] outputs.
"""

import jax
import jax.numpy as jnp

from ...ops.box_ops import box_iou, clip_boxes_to_image, decode_boxes, encode_boxes
from ...ops.losses import smooth_l1_loss, softmax_cross_entropy
from ...ops.matcher import match_proposals
from ...ops.nms import NEG_INF, batched_nms
from ...ops.sampler import sample_topk_indices
from ..layers import (
    conv2d,
    group_norm,
    init_conv,
    init_group_norm,
    init_linear,
    linear,
    relu,
)
from ..poolers import multilevel_roi_align
from ..resnet import apply_res5_head, init_res5_head, make_res5_head_config

# -- feature extractors -----------------------------------------------------------


def init_box_feature_extractor(key, cfg, in_channels):
    name = cfg.MODEL.ROI_BOX_HEAD.FEATURE_EXTRACTOR
    if name == "FBNet.roi_head":
        from ..fbnet import init_fbnet_head

        return init_fbnet_head(key, cfg, in_channels, which="bbox")
    if name == "FPN2MLPFeatureExtractor":
        res = cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
        input_size = in_channels * res * res
        dim = cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM
        k1, k2 = jax.random.split(key)
        return {
            "fc6": init_linear(k1, input_size, dim, init="kaiming_uniform"),
            "fc7": init_linear(k2, dim, dim, init="kaiming_uniform"),
        }, dim
    if name == "ResNet50Conv5ROIFeatureExtractor":
        hc = make_res5_head_config(cfg)
        return {"head": init_res5_head(key, hc)}, hc["out"]
    if name == "FPNXconv1fcFeatureExtractor":
        conv_dim = cfg.MODEL.ROI_BOX_HEAD.CONV_HEAD_DIM
        num_convs = cfg.MODEL.ROI_BOX_HEAD.NUM_STACKED_CONVS
        use_gn = cfg.MODEL.ROI_BOX_HEAD.USE_GN
        res = cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
        dim = cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM
        keys = jax.random.split(key, num_convs + 1)
        convs = []
        cin = in_channels
        for i in range(num_convs):
            c = {
                "conv": init_conv(
                    keys[i], 3, 3, cin, conv_dim, bias=not use_gn,
                    init="kaiming_normal_fanin",
                )
            }
            if use_gn:
                c["gn"] = init_group_norm(conv_dim)
            convs.append(c)
            cin = conv_dim
        fc = init_linear(keys[-1], conv_dim * res * res, dim, init="kaiming_uniform")
        return {"convs": convs, "fc6": fc}, dim
    raise ValueError(name)


def apply_box_feature_extractor(params, x, cfg, compute_dtype=jnp.bfloat16):
    """x: [R, ph, pw, C] pooled features -> [R, D] (or [R, h, w, c] for C4)."""
    name = cfg.MODEL.ROI_BOX_HEAD.FEATURE_EXTRACTOR
    if name == "FBNet.roi_head":
        from ..fbnet import apply_fbnet_head

        return apply_fbnet_head(params, cfg, x, which="bbox", compute_dtype=compute_dtype)
    if name == "FPN2MLPFeatureExtractor":
        r = x.shape[0]
        x = x.reshape(r, -1)
        x = relu(linear(x, params["fc6"], compute_dtype))
        x = relu(linear(x, params["fc7"], compute_dtype))
        return x
    if name == "ResNet50Conv5ROIFeatureExtractor":
        hc = make_res5_head_config(cfg)
        return apply_res5_head(params["head"], x, hc, compute_dtype)
    if name == "FPNXconv1fcFeatureExtractor":
        use_gn = cfg.MODEL.ROI_BOX_HEAD.USE_GN
        for c in params["convs"]:
            x = conv2d(x, c["conv"], padding=1, compute_dtype=compute_dtype)
            if use_gn:
                x = group_norm(x, c["gn"], cfg.MODEL.GROUP_NORM.NUM_GROUPS)
            x = relu(x)
        r = x.shape[0]
        return relu(linear(x.reshape(r, -1), params["fc6"], compute_dtype))
    raise ValueError(name)


# -- predictors ---------------------------------------------------------------------


def init_box_predictor(key, cfg, representation_dim):
    name = cfg.MODEL.ROI_BOX_HEAD.PREDICTOR
    num_classes = cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES
    num_bbox_reg = 2 if cfg.MODEL.CLS_AGNOSTIC_BBOX_REG else num_classes
    k1, k2 = jax.random.split(key)
    if name == "FastRCNNPredictor":
        # avgpool then linear; cls normal(0.01), bbox normal(0.001)
        return {
            "cls_score": init_linear(k1, representation_dim, num_classes, init="normal", std=0.01),
            "bbox_pred": init_linear(k2, representation_dim, num_bbox_reg * 4, init="normal", std=0.001),
        }
    if name == "FPNPredictor":
        return {
            "cls_score": init_linear(k1, representation_dim, num_classes, init="normal", std=0.01),
            "bbox_pred": init_linear(k2, representation_dim, num_bbox_reg * 4, init="normal", std=0.001),
        }
    raise ValueError(name)


def apply_box_predictor(params, x, cfg, compute_dtype=jnp.bfloat16):
    if cfg.MODEL.ROI_BOX_HEAD.PREDICTOR == "FastRCNNPredictor" and x.ndim == 4:
        x = x.mean(axis=(1, 2))  # global avg pool (roi_box_predictors.py:22)
    logits = linear(x, params["cls_score"], compute_dtype).astype(jnp.float32)
    bbox = linear(x, params["bbox_pred"], compute_dtype).astype(jnp.float32)
    return logits, bbox


# -- train-time target prep / subsample ------------------------------------------------


def prepare_box_targets(
    proposals,  # [B, P, 4]
    prop_valid,  # [B, P]
    gt_boxes,  # [B, G, 4]
    gt_labels,  # [B, G] int (0 = pad)
    rng,
    fg_iou,
    bg_iou,
    batch_per_image,
    positive_fraction,
    reg_weights,
    gt_usable=None,  # [B, G] bool: e.g. keypoint models ignore proposals
                     # matched to instances with no visible keypoint
                     # (reference keypoint_head/loss.py:98-105)
):
    """Match + subsample to a fixed ROI batch.

    Returns dict with rois [B, K, 4], labels [B, K] (0 bg), reg_targets
    [B, K, 4], valid [B, K], is_pos [B, K], matched_gt_idx [B, K].
    """
    b = proposals.shape[0]
    keys = jax.random.split(rng, b)
    if gt_usable is None:
        gt_usable = jnp.ones(gt_labels.shape, bool)

    def per_image(props, pvalid, gt_b, gt_l, gt_u, key):
        gt_v = gt_l > 0
        iou = box_iou(gt_b, props)
        iou = jnp.where(pvalid[None, :], iou, -1.0)
        matched = match_proposals(iou, gt_v, fg_iou, bg_iou)
        cls_labels = jnp.where(
            matched >= 0,
            gt_l[jnp.maximum(matched, 0)],
            jnp.where(matched == -1, 0, -1),
        )
        cls_labels = jnp.where(pvalid, cls_labels, -1)
        usable = gt_u[jnp.maximum(matched, 0)]
        cls_labels = jnp.where((matched >= 0) & ~usable, -1, cls_labels)
        idx, valid, is_pos = sample_topk_indices(
            cls_labels, key, batch_per_image, positive_fraction
        )
        rois = props[idx]
        labels = jnp.where(valid, jnp.maximum(cls_labels[idx], 0), -1)
        mg = jnp.maximum(matched[idx], 0)
        reg_targets = encode_boxes(gt_b[mg], rois, reg_weights)
        return rois, labels, reg_targets, valid, is_pos, mg

    rois, labels, reg_targets, valid, is_pos, mg = jax.vmap(per_image)(
        proposals, prop_valid, gt_boxes, gt_labels, gt_usable, keys
    )
    return dict(
        rois=rois, labels=labels, reg_targets=reg_targets, valid=valid,
        is_pos=is_pos, matched_gt_idx=mg,
    )


def box_head_loss(class_logits, box_regression, targets, cls_agnostic=False):
    """class_logits [B*K, C], box_regression [B*K, 4C].
    Reference loss.py:118-193: CE mean over sampled; smooth_l1 (beta=1) on
    positive rows at the gt-class columns, sum / total sampled."""
    labels = targets["labels"].reshape(-1)
    valid = targets["valid"].reshape(-1)
    is_pos = targets["is_pos"].reshape(-1) & valid
    reg_targets = targets["reg_targets"].reshape(-1, 4)

    cls_loss = softmax_cross_entropy(class_logits, labels, mask=valid)

    n = class_logits.shape[0]
    if cls_agnostic:
        cols = jnp.broadcast_to(jnp.arange(4, 8), (n, 4))
    else:
        num_reg = box_regression.shape[-1] // 4
        safe_labels = jnp.clip(labels, 0, num_reg - 1)
        cols = safe_labels[:, None] * 4 + jnp.arange(4)[None, :]
    picked = jnp.take_along_axis(box_regression, cols, axis=1)
    l1 = smooth_l1_loss(picked, reg_targets, beta=1.0)
    n_sampled = jnp.maximum(jnp.sum(valid), 1)
    box_loss = jnp.sum(l1 * is_pos[:, None]) / n_sampled
    return cls_loss, box_loss


# -- inference post-processing ----------------------------------------------------------


def box_head_inference(
    class_logits,  # [B, N, C]
    box_regression,  # [B, N, 4C] (or [B, N, 8] cls-agnostic)
    proposals,  # [B, N, 4]
    prop_valid,  # [B, N]
    image_sizes,  # [B, 2]
    reg_weights,
    score_thresh,
    nms_thresh,
    detections_per_img,
    cls_agnostic=False,
):
    """Fixed-shape version of box_head/inference.py:12-149. Returns padded
    detections dict: boxes [B, D, 4], scores [B, D], labels [B, D],
    valid [B, D]."""
    b, n, c = class_logits.shape
    probs = jax.nn.softmax(class_logits, axis=-1)

    if cls_agnostic:
        decoded = decode_boxes(box_regression[..., 4:8], proposals, reg_weights)
        decoded = jnp.broadcast_to(decoded[:, :, None, :], (b, n, c, 4))
    else:
        decoded = decode_boxes(box_regression, proposals, reg_weights)  # [B,N,4C]
        decoded = decoded.reshape(b, n, c, 4)
    h = image_sizes[:, 0:1].astype(jnp.float32)
    w = image_sizes[:, 1:2].astype(jnp.float32)
    decoded = clip_boxes_to_image(
        decoded.reshape(b, n * c, 4), (h, w)
    ).reshape(b, n, c, 4)

    # Per-class NMS over (batch x class) lanes. Candidates are prefiltered
    # to the top nms_topk_per_class scores per lane — survivors past that
    # rank cannot realistically enter the top DETECTIONS_PER_IMG — which
    # bounds the sequential NMS work.
    nc = c - 1  # foreground classes
    cls_boxes = jnp.moveaxis(decoded[:, :, 1:, :], 2, 1).reshape(b * nc, n, 4)
    cls_scores = jnp.moveaxis(probs[:, :, 1:], 2, 1).reshape(b * nc, n)
    cls_valid = (cls_scores > score_thresh) & jnp.repeat(prop_valid, nc, axis=0)

    k_nms = min(n, max(detections_per_img * 2, 128))
    masked = jnp.where(cls_valid, cls_scores, NEG_INF)
    top_sc, top_ix = jax.lax.top_k(masked, k_nms)  # [B*nc, k]
    top_bx = jnp.take_along_axis(cls_boxes, top_ix[..., None], axis=1)
    top_vl = top_sc > NEG_INF / 2

    keep = batched_nms(top_bx, top_sc, top_vl, nms_thresh)  # [B*nc, k]

    kept_scores = jnp.where(keep, top_sc, NEG_INF).reshape(b, nc * k_nms)
    out_scores, flat_idx = jax.lax.top_k(kept_scores, detections_per_img)
    out_valid = out_scores > NEG_INF / 2
    flat_boxes = top_bx.reshape(b, nc * k_nms, 4)
    out_boxes = jnp.where(
        out_valid[..., None],
        jnp.take_along_axis(flat_boxes, flat_idx[..., None], axis=1),
        0.0,
    )
    out_labels = jnp.where(out_valid, flat_idx // k_nms + 1, 0).astype(jnp.int32)
    out_scores = jnp.where(out_valid, out_scores, 0.0)
    return dict(boxes=out_boxes, scores=out_scores, labels=out_labels, valid=out_valid)


# -- full head wiring ---------------------------------------------------------------


def init_box_head(key, cfg, in_channels):
    k1, k2 = jax.random.split(key)
    fe_params, dim = init_box_feature_extractor(k1, cfg, in_channels)
    pred_params = init_box_predictor(k2, cfg, dim)
    return {"feature_extractor": fe_params, "predictor": pred_params}


def run_box_head(
    params, features, boxes, batch_idx, pcfg, cfg, compute_dtype=jnp.bfloat16,
    pooler_backend="gather", rois_per_image=None,
):
    """Pool + extract + predict for a flat ROI batch.
    boxes [R, 4], batch_idx [R]. Returns (class_logits [R, C],
    box_regression [R, 4C], roi_features [R, ...]). rois_per_image: static
    per-image block size when boxes are image-contiguous (enables the C4
    matmul pooler)."""
    x = multilevel_roi_align(features, boxes, batch_idx, pcfg, compute_dtype,
                             backend=pooler_backend,
                             rois_per_image=rois_per_image)
    feats = apply_box_feature_extractor(
        params["feature_extractor"], x, cfg, compute_dtype
    )
    logits, bbox = apply_box_predictor(params["predictor"], feats, cfg, compute_dtype)
    return logits, bbox, feats
