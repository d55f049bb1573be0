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

pytestmark = pytest.mark.heavy

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


REF_JSON_ARCH = """
{
  "block_op_type": [
    ["ir_k3"],
    ["ir_k5_e6_se", "shuffle"],
    ["skip", "basic_block"],
    ["shift_5x5", "ir_k33_e3"],
    ["ir_k3_s2"]
  ],
  "block_cfg": {
    "first": [16, 2],
    "stages": [
      [[1, 16, 1, 1]],
      [[6, 24, 2, 2]],
      [[4, 24, 2, 1]],
      [[6, 32, 2, 2]],
      [[1, 32, 1, 1]]
    ],
    "backbone": [0, 1, 2, 3],
    "rpn": [],
    "bbox": [4],
    "mask": []
  }
}
"""


def test_fbnet_reference_arch_def_json():
    """A reference-schema ARCH_DEF JSON exercising the exotic primitives
    (SE, channel shuffle, skip, CascadeConv3x3, shift_5x5, cascaded dw,
    grouped pw) builds and runs forward."""
    c = cfg.clone()
    c.merge_from_list([
        "MODEL.BACKBONE.CONV_BODY", "FBNet",
        "MODEL.FBNET.ARCH", "custom_json",
    ])
    # set directly: merge_from_list YAML-parses values, which would turn the
    # JSON string into a dict (same behavior as upstream yacs)
    c.MODEL.FBNET.ARCH_DEF = REF_JSON_ARCH
    bb = build_fbnet_backbone(c)
    params = bb.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    (feat,) = jax.jit(bb.apply)(params, x)
    assert feat.shape[0] == 1 and feat.shape[-1] == 32
    assert np.isfinite(np.asarray(feat, np.float32)).all()


def test_fbnet_parse_op_grammar():
    from maskrcnn_tpu.models.fbnet import parse_op

    op = parse_op("ir_k5_e3_se")
    assert op["kernel"] == 5 and op["exp_override"] == 3 and op["se"]
    op = parse_op("ir_k3_s4")
    assert op["pw_group"] == 4 and op["shuffle"] and op["exp_override"] == 4
    op = parse_op("ir_k33_e1")
    assert op["cdw"] and op["kernel"] == 3 and op["exp_override"] == 1
    op = parse_op("ir_k7_sep_e6")
    assert op["cdw"] and op["kernel"] == 7 and op["exp_override"] == 6
    assert parse_op("skip")["kind"] == "skip"
    assert parse_op("basic_block")["kind"] == "cascade"
    assert parse_op("shift_5x5")["kind"] == "shift"
    assert parse_op("shuffle")["pw_group"] == 4
