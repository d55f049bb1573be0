import os
import sys

import numpy as np
import pytest

import jax

# every test here jit-compiles the full demo model on CPU (~0.5-1.5 min each)
pytestmark = pytest.mark.heavy

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demo"))

from maskrcnn_tpu.config import cfg

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def tiny_cfg(yaml="e2e_mask_rcnn_R_50_FPN_1x.yaml"):
    c = cfg.clone()
    c.merge_from_file(os.path.join(CONFIG_DIR, yaml))
    c.MODEL.WEIGHT = ""
    c.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    c.MODEL.RPN.POST_NMS_TOP_N_TEST = 32
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 32
    c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 8
    c.MODEL.ROI_HEADS.SCORE_THRESH = 0.0
    c.freeze()
    return c


def test_coco_demo_runs():
    from predictor import COCODemo

    c = tiny_cfg()
    demo = COCODemo(c, confidence_threshold=0.0, min_image_size=96)
    img = (np.random.RandomState(0).rand(120, 160, 3) * 255).astype(np.uint8)
    out = demo.run_on_opencv_image(img)
    assert out.shape == img.shape
    preds = demo.compute_prediction(img)
    assert preds.size == (160, 120)
    assert preds.has_field("mask")
    masks = preds.get_field("mask")
    assert masks.shape[1:] == (120, 160)  # pasted to full image


def test_bbox_aug_union():
    from PIL import Image

    from maskrcnn_tpu.engine.bbox_aug import im_detect_bbox_aug
    from maskrcnn_tpu.models import build_detection_model

    c = cfg.clone()
    c.merge_from_file(os.path.join(CONFIG_DIR, "e2e_faster_rcnn_R_50_FPN_1x.yaml"))
    c.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    c.MODEL.RPN.POST_NMS_TOP_N_TEST = 32
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 32
    c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 8
    c.MODEL.ROI_HEADS.SCORE_THRESH = 0.0
    c.TEST.BBOX_AUG.ENABLED = True
    c.TEST.BBOX_AUG.H_FLIP = True
    c.TEST.BBOX_AUG.SCALES = ()
    c.INPUT.MIN_SIZE_TEST = 96
    c.INPUT.MAX_SIZE_TEST = 160
    c.freeze()

    model = build_detection_model(c)
    params = model.init(jax.random.PRNGKey(0))
    infer = jax.jit(model.infer_forward)

    def device_infer(batch):
        import jax.numpy as jnp

        return infer(params, {k: jnp.asarray(v) for k, v in batch.items()})

    img = Image.fromarray(
        (np.random.RandomState(1).rand(100, 140, 3) * 255).astype(np.uint8)
    )
    results = im_detect_bbox_aug(model, params, [img], device_infer, c)
    assert len(results) == 1
    assert results[0].size == (140, 100)
    assert len(results[0]) <= c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG


def test_coco_demo_c4():
    """BASELINE config #1: Faster R-CNN R-50-C4 inference via COCODemo —
    the single-level pooler with the adaptive sampling_ratio=0 grid."""
    from predictor import COCODemo

    c = tiny_cfg("e2e_faster_rcnn_R_50_C4_1x.yaml")
    demo = COCODemo(c, confidence_threshold=0.0, min_image_size=96)
    img = (np.random.RandomState(1).rand(120, 160, 3) * 255).astype(np.uint8)
    out = demo.run_on_opencv_image(img)
    assert out.shape == img.shape
    preds = demo.compute_prediction(img)
    assert preds.size == (160, 120)
    assert np.isfinite(np.asarray(preds.bbox)).all()
