"""FBNet build/run smoke (reference tests/test_fbnet.py exercises every
primitive; our scope: every shipped arch builds and runs, and the two
detection configs produce valid outputs)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maskrcnn_tpu.config import cfg
from maskrcnn_tpu.models import build_detection_model
from maskrcnn_tpu.models.fbnet import MODEL_ARCH, FBNetPlan, build_fbnet_backbone

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.mark.parametrize("arch", sorted(MODEL_ARCH.keys()))
def test_fbnet_backbone_runs(arch):
    c = cfg.clone()
    c.MODEL.BACKBONE.CONV_BODY = "FBNet"
    c.MODEL.FBNET.ARCH = arch
    c.MODEL.FBNET.WIDTH_DIVISOR = 8
    bb = build_fbnet_backbone(c)
    params = bb.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    (out,) = bb.apply(params, x, compute_dtype=jnp.float32)
    assert out.shape[0] == 1 and out.shape[-1] == bb.out_channels
    assert out.shape[1] == 64 // bb.strides[0]
    assert np.isfinite(np.asarray(out)).all()


def test_fbnet_channel_scaling():
    c = cfg.clone()
    c.MODEL.FBNET.ARCH = "default"
    c.MODEL.FBNET.SCALE_FACTOR = 0.5
    c.MODEL.FBNET.WIDTH_DIVISOR = 8
    plan = FBNetPlan(c)
    assert all(b["out"] % 8 == 0 for b in plan.trunk_blocks)


def test_fbnet_detector_infer():
    c = cfg.clone()
    c.merge_from_file(os.path.join(CONFIG_DIR, "e2e_faster_rcnn_fbnet.yaml"))
    c.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    c.MODEL.RPN.POST_NMS_TOP_N_TEST = 32
    c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 8
    c.freeze()
    model = build_detection_model(c)
    params = model.init(jax.random.PRNGKey(0))
    batch = dict(
        images=jnp.asarray(np.random.RandomState(0).randn(1, 96, 128, 3), jnp.float32),
        image_sizes=jnp.asarray([[96, 128]], jnp.int32),
    )
    det = jax.jit(model.infer_forward)(params, batch)
    assert det["boxes"].shape == (1, 8, 4)
    assert np.isfinite(np.asarray(det["boxes"])).all()
