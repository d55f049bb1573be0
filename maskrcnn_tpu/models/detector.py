"""GeneralizedRCNN meta-architecture and build_detection_model.

Reference: maskrcnn_benchmark/modeling/detector/generalized_rcnn.py:16-65 and
roi_heads/roi_heads.py:9-76. One meta-architecture covers Faster/Mask/
Keypoint R-CNN, RPN-only and RetinaNet (cfg switches), as in the reference.

The model object bundles:
  * init(rng) -> params (nested dict pytree)
  * train_forward(params, batch, rng) -> loss dict          [jittable]
  * infer_forward(params, batch) -> padded detections dict  [jittable]
  * frozen_mask(params) -> bool pytree for the optimizer

Batch layout (everything padded, fixed shapes):
  images [B, H, W, 3] float32 (normalized, NHWC) or uint8 RGB (normalized
    on device when TPU.DEVICE_NORMALIZE; see _prepare_images)
  image_sizes [B, 2] int32 (true h, w)
  gt_boxes [B, G, 4], gt_labels [B, G] (0 = padding)
  gt_masks [B, G, S, S] uint8 (MASK_ON; patch aligned to gt box)
  gt_keypoints [B, G, K, 3] (KEYPOINT_ON)
"""

import jax
import jax.numpy as jnp
from jax import lax

from .anchors import make_anchor_generator, make_anchor_generator_retinanet
from .backbone import build_backbone
from .poolers import PoolerConfig, multilevel_roi_align
from .retinanet import (
    apply_retinanet_head,
    init_retinanet_head,
    make_retinanet_cfg,
    retinanet_inference,
    retinanet_loss,
)
from .roi_heads import box_head as bh
from .roi_heads import keypoint_head as kh
from .roi_heads import mask_head as mh
from .rpn import (
    apply_rpn_head,
    init_rpn_head,
    make_rpn_cfg,
    rpn_loss,
    select_proposals,
)


def _flatten_rois(boxes):
    """[B, K, 4] -> ([B*K, 4], batch_idx [B*K])."""
    b, k, _ = boxes.shape
    flat = boxes.reshape(b * k, 4)
    idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
    return flat, idx


def _compact_positives(pos_state, cap):
    """Cross-image compaction of the positive-ROI batch for the mask and
    keypoint heads.

    The box-head sampler pads each image to the full positive quota
    (BATCH_SIZE_PER_IMAGE * POSITIVE_FRACTION = 128), so the flat positive
    batch is B*128 rows of which typically only a small fraction are real
    positives — yet every row pays full freight through the pooler and the
    per-ROI conv stacks. Packing the VALID positives from the whole batch
    into a `cap`-row budget (TPU.MASK_ROI_CAP / TPU.KEYPOINT_ROI_CAP per
    image, batch-global) cuts that cost proportionally.

    Loss-preserving: the head losses normalize over the valid count, so as
    long as every valid positive survives (the common case — the cap only
    binds when a batch carries > cap real positives, i.e. pathological
    crowding) the loss is bit-identical to the uncompacted path. Under
    crowding it subsamples positives, the same trade the reference makes
    per image via its sampling quota (loss.py:55-68). cap <= 0 disables.

    pos_state = (rois [R,4], batch_idx [R], valid [R], labels [R],
    matched_gt [R]); returns the same tuple at [cap] rows (sorted original
    order, preserving the sorted-ROI locality the Pallas pooler exploits).
    """
    rois, batch_idx, valid, labels, mg = pos_state
    if not (0 < cap < rois.shape[0]):
        return pos_state
    from ..ops.sampler import top_k_fast

    _, sel = top_k_fast(valid.astype(jnp.float32), cap)
    sel = jnp.sort(sel)
    return (rois[sel], batch_idx[sel], valid[sel], labels[sel], mg[sel])


class GeneralizedRCNN:
    def __init__(self, cfg):
        self.cfg = cfg.clone() if hasattr(cfg, "clone") else cfg
        cfg = self.cfg
        self.compute_dtype = (
            jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        )
        self.backbone = build_backbone(cfg)
        self.pixel_mean = tuple(cfg.INPUT.PIXEL_MEAN)
        self.pixel_std = tuple(cfg.INPUT.PIXEL_STD)
        self.to_bgr255 = cfg.INPUT.TO_BGR255
        self.retinanet_on = cfg.MODEL.RETINANET_ON
        self.rpn_only = cfg.MODEL.RPN_ONLY
        self.mask_on = cfg.MODEL.MASK_ON and not self.retinanet_on
        self.keypoint_on = cfg.MODEL.KEYPOINT_ON and not self.retinanet_on

        if self.retinanet_on:
            self.anchor_gen = make_anchor_generator_retinanet(cfg)
            self.retina_cfg = make_retinanet_cfg(cfg)
        else:
            self.anchor_gen = make_anchor_generator(cfg)
            self.rpn_cfg = make_rpn_cfg(cfg)
        self.num_anchors = self.anchor_gen.num_anchors_per_location()[0]

        hcfg = cfg.MODEL.ROI_HEADS
        self.box_reg_weights = tuple(hcfg.BBOX_REG_WEIGHTS)
        self.box_pooler = PoolerConfig(
            cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES,
            cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
        )
        if self.mask_on:
            self.mask_pooler = PoolerConfig(
                cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION,
                cfg.MODEL.ROI_MASK_HEAD.POOLER_SCALES,
                cfg.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO,
            )
            self.share_mask_fe = cfg.MODEL.ROI_MASK_HEAD.SHARE_BOX_FEATURE_EXTRACTOR
        if self.keypoint_on:
            self.kp_pooler = PoolerConfig(
                cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION,
                cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_SCALES,
                cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_SAMPLING_RATIO,
            )
        # fixed mask/keypoint ROI batch = the positive quota
        self.num_pos_rois = int(
            hcfg.BATCH_SIZE_PER_IMAGE * hcfg.POSITIVE_FRACTION
        )
        self.pooler_backend_cfg = getattr(cfg.TPU, "POOLER_BACKEND", "auto")

    # -- init ---------------------------------------------------------------

    def init(self, rng):
        cfg = self.cfg
        keys = jax.random.split(rng, 5)
        params = {"backbone": self.backbone.init(keys[0])}
        if self.retinanet_on:
            params["rpn"] = init_retinanet_head(
                keys[1], cfg, self.backbone.out_channels
            )
            return params
        if cfg.MODEL.RPN.RPN_HEAD == "FBNet.rpn_head":
            from .fbnet import init_fbnet_rpn_head

            params["rpn"] = init_fbnet_rpn_head(
                keys[1], cfg, self.backbone.out_channels, self.num_anchors
            )
        else:
            params["rpn"] = init_rpn_head(
                keys[1], self.backbone.out_channels, self.num_anchors
            )
        if not self.rpn_only:
            roi = {"box": bh.init_box_head(keys[2], cfg, self.backbone.out_channels)}
            if self.mask_on:
                roi["mask"] = mh.init_mask_head(
                    keys[3], cfg, self.backbone.out_channels
                )
                if self.share_mask_fe:
                    # reference shares the module itself (roi_heads.py:64-66)
                    roi["mask"].pop("feature_extractor")
            if self.keypoint_on:
                roi["keypoint"] = kh.init_keypoint_head(
                    keys[4], cfg, self.backbone.out_channels
                )
            params["roi_heads"] = roi
        return params

    def frozen_mask(self, params):
        mask = {"backbone": self.backbone.frozen_mask(params["backbone"])}
        for k in params:
            if k != "backbone":
                mask[k] = jax.tree.map(lambda _: False, params[k])
        return mask

    # -- shared pieces ------------------------------------------------------------

    def _anchors(self, features):
        """Per-level anchors for the (static) feature shapes."""
        return [
            self.anchor_gen.grid_anchors_level(l, f.shape[1], f.shape[2])
            for l, f in enumerate(features)
        ]

    def _rpn_outputs(self, params, features):
        if self.cfg.MODEL.RPN.RPN_HEAD == "FBNet.rpn_head":
            from .fbnet import apply_fbnet_rpn_head

            return apply_fbnet_rpn_head(
                params["rpn"], self.cfg, features, self.compute_dtype
            )
        return apply_rpn_head(params["rpn"], features, self.compute_dtype)

    def _box_features(self, features):
        return features[: len(self.box_pooler.scales)]

    def _infer_pooler_backend(self, num_levels, is_train=False):
        """Pallas patch-DMA pooler on TPU (multi-level, 128-aligned channels
        only); training additionally pairs it with the Pallas RMW backward
        (custom_vjp). Otherwise the exact gather pooler + autodiff."""
        if self.pooler_backend_cfg == "gather" or num_levels <= 1:
            return "gather"
        if self.backbone.out_channels % 128 != 0:
            return "gather"
        if self.pooler_backend_cfg == "pallas":
            return "pallas_train" if is_train else "pallas"
        from ..ops.nms import _use_pallas

        if not _use_pallas():
            return "gather"
        return "pallas_train" if is_train else "pallas"

    def _run_mask_extractor(self, params, features, boxes, batch_idx,
                            pooler_backend="gather", rois_per_image=None):
        if self.share_mask_fe:
            x = multilevel_roi_align(
                self._box_features(features), boxes, batch_idx, self.box_pooler,
                self.compute_dtype, backend=pooler_backend,
                rois_per_image=rois_per_image,
            )
            x = bh.apply_box_feature_extractor(
                params["roi_heads"]["box"]["feature_extractor"], x, self.cfg,
                self.compute_dtype,
            )
            return x
        x = multilevel_roi_align(
            features[: len(self.mask_pooler.scales)], boxes, batch_idx,
            self.mask_pooler, self.compute_dtype, backend=pooler_backend,
            rois_per_image=rois_per_image,
        )
        return mh.apply_mask_feature_extractor(
            params["roi_heads"]["mask"]["feature_extractor"], x, self.cfg,
            self.compute_dtype,
        )

    def _prepare_images(self, images, image_sizes):
        """Device-side normalization for uint8 batches (TPU.DEVICE_NORMALIZE):
        the exact host Normalize math — RGB->BGR channel flip at 0-255 scale
        (or /255), then (x - mean) / std in float32 — with the padded region
        re-zeroed so the zero-padding contract of the reference's ImageList
        (structures/image_list.py:44-60) is preserved bit-for-bit. float32
        inputs are assumed already normalized and zero-padded on host."""
        if images.dtype != jnp.uint8:
            return images
        return self._normalize_uint8(images, image_sizes)

    def _normalize_uint8(self, images, image_sizes):
        x = images.astype(jnp.float32)
        if self.to_bgr255:
            x = x[..., ::-1]
        else:
            x = x / 255.0
        x = (x - jnp.asarray(self.pixel_mean, jnp.float32)) / jnp.asarray(
            self.pixel_std, jnp.float32
        )
        _, h, w, _ = x.shape
        ys = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
        xs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
        mask = (ys < image_sizes[:, 0][:, None, None, None]) & (
            xs < image_sizes[:, 1][:, None, None, None]
        )
        return jnp.where(mask, x, 0.0)

    # -- training -------------------------------------------------------------------

    def train_forward(self, params, batch, rng):
        cfg = self.cfg
        image_sizes = batch["image_sizes"]
        with jax.named_scope("image_prep"):
            images = self._prepare_images(batch["images"], image_sizes)
        gt_boxes = batch["gt_boxes"].astype(jnp.float32)
        gt_labels = batch["gt_labels"]
        gt_valid = gt_labels > 0

        with jax.named_scope("backbone"):
            features = self.backbone.apply(
                params["backbone"], images, self.compute_dtype
            )
        anchors = self._anchors(features)

        if self.retinanet_on:
            cls_lvls, reg_lvls = apply_retinanet_head(
                params["rpn"], features, self.compute_dtype
            )
            b = images.shape[0]
            nc = self.retina_cfg["num_classes"] - 1
            cat_anchors = jnp.concatenate(anchors, axis=0)
            cls = jnp.concatenate(
                [c.reshape(b, -1, nc) for c in cls_lvls], axis=1
            )
            reg = jnp.concatenate(
                [r.reshape(b, -1, 4) for r in reg_lvls], axis=1
            )
            cls_loss, reg_loss = retinanet_loss(
                cat_anchors, cls, reg, gt_boxes, gt_labels, self.retina_cfg
            )
            return {"loss_retina_cls": cls_loss, "loss_retina_reg": reg_loss}

        rng_rpn, rng_box = jax.random.split(rng)
        with jax.named_scope("rpn_head"):
            objectness, bbox_reg = self._rpn_outputs(params, features)

        # RPN loss over all anchors
        b = images.shape[0]
        cat_anchors = jnp.concatenate(anchors, axis=0)
        h = image_sizes[:, 0:1].astype(jnp.float32)
        w = image_sizes[:, 1:2].astype(jnp.float32)
        visible = jax.vmap(
            lambda hh, ww: self.anchor_gen.visibility(cat_anchors, hh, ww)
        )(h[:, 0], w[:, 0])
        obj_cat = jnp.concatenate(
            [o.reshape(b, -1) for o in objectness], axis=1
        )
        a = self.num_anchors
        reg_cat = jnp.concatenate(
            [r.reshape(b, -1, a, 4).reshape(b, -1, 4) for r in bbox_reg], axis=1
        )
        with jax.named_scope("rpn_loss"):
            loss_obj, loss_rpn_box = rpn_loss(
                cat_anchors, visible, obj_cat, reg_cat, gt_boxes, gt_valid,
                rng_rpn,
                self.rpn_cfg["fg_iou"], self.rpn_cfg["bg_iou"],
                self.rpn_cfg["batch_per_image"],
                self.rpn_cfg["positive_fraction"],
            )
        losses = {"loss_objectness": loss_obj, "loss_rpn_box_reg": loss_rpn_box}
        if self.rpn_only:
            return losses

        # proposals (no grad through selection, generalized_rcnn/inference)
        with jax.named_scope("proposals"):
            prop_boxes, prop_scores, prop_valid = select_proposals(
                [lax.stop_gradient(x) for x in anchors],
                [lax.stop_gradient(o) for o in objectness],
                [lax.stop_gradient(r) for r in bbox_reg],
                image_sizes, self.rpn_cfg, is_train=True,
                gt_boxes=gt_boxes, gt_valid=gt_valid,
            )

        hcfg = cfg.MODEL.ROI_HEADS
        gt_usable = None
        if self.keypoint_on and "gt_keypoints" in batch:
            # instances with no visible keypoint inside their box are
            # excluded from sampling (reference keypoint loss.py:98-105)
            gt_usable = kh.keypoints_within_box_filter(
                batch["gt_keypoints"].astype(jnp.float32), gt_boxes
            )
        with jax.named_scope("box_targets"):
            targets = bh.prepare_box_targets(
                prop_boxes, prop_valid, gt_boxes, gt_labels, rng_box,
                hcfg.FG_IOU_THRESHOLD, hcfg.BG_IOU_THRESHOLD,
                hcfg.BATCH_SIZE_PER_IMAGE, hcfg.POSITIVE_FRACTION,
                self.box_reg_weights, gt_usable=gt_usable,
            )

        pb = self._infer_pooler_backend(
            len(self.box_pooler.scales), is_train=True
        )
        rois_flat, batch_idx = _flatten_rois(targets["rois"])
        with jax.named_scope("box_head"):
            class_logits, box_regression, _ = bh.run_box_head(
                params["roi_heads"]["box"], self._box_features(features),
                rois_flat, batch_idx, self.box_pooler, cfg, self.compute_dtype,
                pooler_backend=pb,
                rois_per_image=targets["rois"].shape[1],
            )
        with jax.named_scope("box_loss"):
            cls_loss, box_loss = bh.box_head_loss(
                class_logits, box_regression, targets,
                cls_agnostic=cfg.MODEL.CLS_AGNOSTIC_BBOX_REG,
            )
        losses["loss_classifier"] = cls_loss
        losses["loss_box_reg"] = box_loss

        if self.mask_on or self.keypoint_on:
            pos_idx, pos_valid = mh.select_positive_rois(targets, self.num_pos_rois)
            pos_rois = jnp.take_along_axis(
                targets["rois"], pos_idx[..., None], axis=1
            )  # [B, Km, 4]
            pos_labels = jnp.take_along_axis(targets["labels"], pos_idx, axis=1)
            pos_mg = jnp.take_along_axis(
                targets["matched_gt_idx"], pos_idx, axis=1
            )
            pos_flat, pos_batch = _flatten_rois(pos_rois)
            pos_state = (
                pos_flat, pos_batch, pos_valid.reshape(-1),
                pos_labels.reshape(-1), pos_mg.reshape(-1),
            )

        if self.mask_on:
            # cross-image compaction (see _compact_positives): the 4-conv +
            # deconv mask stack over the padded B*128 positive quota is ~15%
            # of the step, while real batches carry far fewer positives
            m_rois, m_batch, m_valid, m_labels, m_mg = _compact_positives(
                pos_state, cfg.TPU.MASK_ROI_CAP * images.shape[0]
            )
            with jax.named_scope("mask_head"):
                x = self._run_mask_extractor(
                    params, features, m_rois, m_batch, pooler_backend=pb
                )
                # gt-class-only logits: the loss never reads the other C-1
                # channels, and skipping them avoids a [R, M, M, C] f32
                # zeros+scatter in the backward pass
                mask_logits = mh.apply_mask_predictor_at_class(
                    params["roi_heads"]["mask"]["predictor"], x,
                    m_labels, cfg, self.compute_dtype
                )  # [R, M, M]
            with jax.named_scope("mask_targets"):
                # gather matched gt mask patches by flat (image, gt) index
                gt_masks = batch["gt_masks"].astype(jnp.float32)  # [B,G,S,S]
                g = gt_masks.shape[1]
                flat_ix = m_batch * g + m_mg
                s = gt_masks.shape[-1]
                patches = jnp.take(gt_masks.reshape(-1, s, s), flat_ix, axis=0)
                matched_boxes = jnp.take(gt_boxes.reshape(-1, 4), flat_ix, axis=0)
                m_res = mask_logits.shape[1]
                tgt = mh.project_gt_masks(patches, matched_boxes, m_rois, m_res)
                losses["loss_mask"] = mh.mask_head_loss_picked(
                    mask_logits, tgt, m_valid
                )

        if self.keypoint_on:
            kp_rois, kp_batch, kp_valid, _, kp_mg = _compact_positives(
                pos_state, cfg.TPU.KEYPOINT_ROI_CAP * images.shape[0]
            )
            gt_kps = batch["gt_keypoints"].astype(jnp.float32)  # [B,G,K,3]
            g = gt_kps.shape[1]
            kk = gt_kps.shape[2]
            kp_targets = jnp.take(
                gt_kps.reshape(-1, kk, 3), kp_batch * g + kp_mg, axis=0
            )
            with jax.named_scope("keypoint_head"):
                kp_logits = kh.run_keypoint_head(
                    params["roi_heads"]["keypoint"],
                    features[: len(self.kp_pooler.scales)],
                    kp_rois, kp_batch, self.kp_pooler, cfg,
                    self.compute_dtype,
                    pooler_backend=self._infer_pooler_backend(
                        len(self.kp_pooler.scales), is_train=True
                    ),
                )
            with jax.named_scope("keypoint_loss"):
                losses["loss_kp"] = kh.keypoint_head_loss(
                    kp_logits, kp_targets, kp_rois, kp_valid
                )
        return losses

    # -- inference --------------------------------------------------------------------

    def infer_forward(self, params, batch):
        cfg = self.cfg
        image_sizes = batch["image_sizes"]
        with jax.named_scope("image_prep"):
            images = self._prepare_images(batch["images"], image_sizes)
        with jax.named_scope("backbone"):
            features = self.backbone.apply(
                params["backbone"], images, self.compute_dtype
            )
        anchors = self._anchors(features)

        if self.retinanet_on:
            cls_lvls, reg_lvls = apply_retinanet_head(
                params["rpn"], features, self.compute_dtype
            )
            return retinanet_inference(
                anchors, cls_lvls, reg_lvls, image_sizes, self.retina_cfg
            )

        with jax.named_scope("rpn_head"):
            objectness, bbox_reg = self._rpn_outputs(params, features)
        with jax.named_scope("proposals"):
            prop_boxes, prop_scores, prop_valid = select_proposals(
                anchors, objectness, bbox_reg, image_sizes, self.rpn_cfg,
                is_train=False,
            )
        if self.rpn_only:
            return dict(
                boxes=prop_boxes, scores=prop_scores,
                labels=jnp.ones(prop_scores.shape, jnp.int32),
                valid=prop_valid,
            )

        rois_flat, batch_idx = _flatten_rois(prop_boxes)
        pb = self._infer_pooler_backend(len(self.box_pooler.scales))
        with jax.named_scope("box_head"):
            class_logits, box_regression, _ = bh.run_box_head(
                params["roi_heads"]["box"], self._box_features(features),
                rois_flat, batch_idx, self.box_pooler, cfg, self.compute_dtype,
                pooler_backend=pb,
                rois_per_image=prop_boxes.shape[1],
            )
        b, n = prop_scores.shape
        c = class_logits.shape[-1]
        with jax.named_scope("box_postproc"):
            detections = bh.box_head_inference(
                class_logits.reshape(b, n, c),
                box_regression.reshape(b, n, -1),
                prop_boxes, prop_valid, image_sizes,
                self.box_reg_weights,
                cfg.MODEL.ROI_HEADS.SCORE_THRESH,
                cfg.MODEL.ROI_HEADS.NMS,
                cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG,
                cls_agnostic=cfg.MODEL.CLS_AGNOSTIC_BBOX_REG,
            )

        if self.mask_on:
            det_flat, det_batch = _flatten_rois(detections["boxes"])
            with jax.named_scope("mask_head"):
                x = self._run_mask_extractor(
                    params, features, det_flat, det_batch, pooler_backend=pb,
                    rois_per_image=detections["boxes"].shape[1],
                )
                mask_logits = mh.apply_mask_predictor(
                    params["roi_heads"]["mask"]["predictor"], x, cfg,
                    self.compute_dtype,
                )  # [B*D, M, M, C]
            labels = detections["labels"].reshape(-1)
            safe = jnp.clip(labels, 0, mask_logits.shape[-1] - 1)
            probs = jax.nn.sigmoid(
                jnp.take_along_axis(
                    mask_logits, safe[:, None, None, None], axis=3
                )[..., 0]
            )
            d = detections["boxes"].shape[1]
            m = probs.shape[1]
            detections["masks"] = probs.reshape(b, d, m, m)

        if self.keypoint_on:
            det_flat, det_batch = _flatten_rois(detections["boxes"])
            kp_logits = kh.run_keypoint_head(
                params["roi_heads"]["keypoint"],
                features[: len(self.kp_pooler.scales)],
                det_flat, det_batch, self.kp_pooler, cfg, self.compute_dtype,
                pooler_backend=pb,
            )
            d = detections["boxes"].shape[1]
            hh = kp_logits.shape[1]
            if getattr(cfg.TPU, "KEYPOINT_DECODE_ON_DEVICE", False):
                # throughput mode: decode on device (4x bilinear + argmax)
                # and ship only [B, D, 17, 4] — the exact host decode would
                # otherwise pull ~21 MB/image of raw heatmaps over PCIe/ICI
                kps = kh.heatmaps_to_keypoints(
                    kp_logits.astype(jnp.float32), det_flat
                )
                detections["keypoints"] = kps.reshape(b, d, -1, 4)
            else:
                # raw heatmaps ride along so the host runs the exact cv2
                # bicubic decode (reference keypoint_head/inference.py:
                # 40-98); the engine prefers decoded "keypoints" when
                # present, else falls back to these heatmaps. No dead
                # double-decode is computed either way.
                detections["kp_heatmaps"] = kp_logits.astype(
                    jnp.float32
                ).reshape(b, d, hh, hh, kp_logits.shape[-1])
        return detections


def build_detection_model(cfg):
    from .registry import META_ARCHITECTURES

    meta = cfg.MODEL.META_ARCHITECTURE
    if meta in META_ARCHITECTURES:
        return META_ARCHITECTURES[meta](cfg)
    if meta != "GeneralizedRCNN":
        raise ValueError("Unknown META_ARCHITECTURE {}".format(meta))
    return GeneralizedRCNN(cfg)
