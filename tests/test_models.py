"""Model build/run smoke tests (tiny shapes).

Mirrors the reference's tests/test_detectors.py strategy: build every
config's model, run eval-mode forward on random input, check output
contract. Shrunken NMS top-k for speed (reference does the same,
test_detectors.py:105-106).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from maskrcnn_tpu.config import cfg
from maskrcnn_tpu.models import build_detection_model

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def tiny(c):
    c.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    c.MODEL.RPN.POST_NMS_TOP_N_TEST = 32
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 32
    c.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 64
    c.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 32
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = 48
    c.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 8
    c.MODEL.RETINANET.PRE_NMS_TOP_N = 64
    c.TEST.DETECTIONS_PER_IMG = 8
    c.TPU.MAX_GT_BOXES = 8
    return c


def make_batch(b=2, h=96, w=128, with_targets=False, num_kp=17):
    rs = np.random.RandomState(0)
    batch = dict(
        images=jnp.asarray(rs.randn(b, h, w, 3), jnp.float32),
        image_sizes=jnp.asarray([[h - 8, w - 16]] * b, jnp.int32),
    )
    if with_targets:
        g = 8
        gt_boxes = np.zeros((b, g, 4), np.float32)
        gt_boxes[:, :2] = [[10, 10, 60, 70], [30, 20, 90, 80]]
        gt_labels = np.zeros((b, g), np.int32)
        gt_labels[:, :2] = [1, 1]
        batch.update(
            gt_boxes=jnp.asarray(gt_boxes),
            gt_labels=jnp.asarray(gt_labels),
            gt_masks=jnp.asarray((rs.rand(b, g, 28, 28) > 0.5).astype(np.uint8)),
            gt_keypoints=jnp.asarray(
                np.tile(
                    np.array([[40.0, 40.0, 2.0]], np.float32), (b, g, num_kp, 1)
                )
            ),
        )
    return batch


# Fast subset keeps one config per distinct code path (FPN+mask, C4, and the
# single-stage RetinaNet); the remaining permutations compile the same stages
# and run under -m heavy.
CONFIGS = [
    pytest.param("e2e_faster_rcnn_R_50_FPN_1x.yaml", marks=pytest.mark.heavy),
    "e2e_faster_rcnn_R_50_C4_1x.yaml",
    "e2e_mask_rcnn_R_50_FPN_1x.yaml",
    pytest.param("e2e_mask_rcnn_R_50_C4_1x.yaml", marks=pytest.mark.heavy),
    pytest.param("e2e_keypoint_rcnn_R_50_FPN_1x.yaml", marks=pytest.mark.heavy),
    "retinanet/retinanet_R-50-FPN_1x.yaml",
    pytest.param("rpn_R_50_FPN_1x.yaml", marks=pytest.mark.heavy),
    pytest.param(
        "gn_baselines/e2e_mask_rcnn_R_50_FPN_1x_gn.yaml",
        marks=pytest.mark.heavy,
    ),
]


def test_all_own_configs_merge():
    n = 0
    for root, _, files in os.walk(CONFIG_DIR):
        for fn in files:
            if fn.endswith(".yaml"):
                c = cfg.clone()
                c.merge_from_file(os.path.join(root, fn))
                n += 1
    assert n >= 15


@pytest.mark.parametrize("config", CONFIGS)
def test_build_and_infer(config):
    c = tiny(cfg.clone())
    c.merge_from_file(os.path.join(CONFIG_DIR, config))
    c = tiny(c)
    c.freeze()
    model = build_detection_model(c)
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch()
    det = jax.jit(model.infer_forward)(params, batch)
    b = batch["images"].shape[0]
    assert det["boxes"].shape[0] == b
    assert det["boxes"].shape[2] == 4
    assert det["scores"].shape == det["labels"].shape == det["valid"].shape
    # valid detections have finite boxes inside the image
    boxes = np.asarray(det["boxes"])
    assert np.isfinite(boxes).all()


def test_keypoint_on_device_decode():
    """TPU.KEYPOINT_DECODE_ON_DEVICE=True returns decoded [B, D, 17, 4]
    keypoints (x, y, 1, logit) instead of raw heatmaps, and the decoded
    coordinates agree with running kh.heatmaps_to_keypoints on the default
    path's heatmaps (same model, same input)."""
    from maskrcnn_tpu.models.roi_heads import keypoint_head as kh

    c = tiny(cfg.clone())
    c.merge_from_file(
        os.path.join(CONFIG_DIR, "e2e_keypoint_rcnn_R_50_FPN_1x.yaml")
    )
    c = tiny(c)
    c.freeze()
    model = build_detection_model(c)
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch()
    det_host = jax.jit(model.infer_forward)(params, batch)
    assert "kp_heatmaps" in det_host and "keypoints" not in det_host

    c2 = c.clone()
    c2.defrost()
    c2.TPU.KEYPOINT_DECODE_ON_DEVICE = True
    c2.freeze()
    model2 = build_detection_model(c2)
    det_dev = jax.jit(model2.infer_forward)(params, batch)
    assert "keypoints" in det_dev and "kp_heatmaps" not in det_dev
    b, d = det_dev["boxes"].shape[:2]
    assert det_dev["keypoints"].shape == (b, d, 17, 4)

    hm = det_host["kp_heatmaps"]
    boxes = det_host["boxes"].reshape(b * d, 4)
    expect = kh.heatmaps_to_keypoints(
        hm.reshape(b * d, hm.shape[2], hm.shape[3], hm.shape[4]), boxes
    ).reshape(b, d, -1, 4)
    np.testing.assert_allclose(
        np.asarray(det_dev["keypoints"]), np.asarray(expect),
        rtol=1e-5, atol=1e-4,
    )


@pytest.mark.parametrize("config", ["e2e_mask_rcnn_R_50_FPN_1x.yaml"])
def test_train_step_updates_params(config):
    from maskrcnn_tpu.engine.train_step import make_train_step
    from maskrcnn_tpu.solver import make_optimizer

    c = tiny(cfg.clone())
    c.merge_from_file(os.path.join(CONFIG_DIR, config))
    c = tiny(c)
    c.SOLVER.BASE_LR = 0.01
    c.SOLVER.WARMUP_ITERS = 0
    c.freeze()
    model = build_detection_model(c)
    params = model.init(jax.random.PRNGKey(0))
    frozen = model.frozen_mask(params)
    tx, _ = make_optimizer(c, params, frozen)
    opt_state = tx.init(params)
    batch = make_batch(with_targets=True)
    step = make_train_step(model, tx, mesh=None, donate=False)
    new_params, new_opt, metrics = step(params, opt_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # trainable params move, frozen params don't
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), params, new_params
    )
    rpn_moved = jax.tree.leaves(moved["rpn"])
    assert max(rpn_moved) > 0
    # frozen stem must not move
    stem_moved = jax.tree.leaves(moved["backbone"]["body"]["stem"])
    assert max(stem_moved) == 0
    # frozen-BN buffers in trainable stages must not move
    bn_moved = moved["backbone"]["body"]["layer2"][0]["bn1"]
    assert max(jax.tree.leaves(bn_moved)) == 0


@pytest.mark.heavy
@pytest.mark.parametrize(
    "config",
    [
        # deformable-conv and GroupNorm paths must TRAIN, not just apply
        # (reference modeling/backbone/resnet.py:239-344 DCN hook,
        # configs/dcn/*.yaml, configs/gn_baselines/*.yaml)
        "dcn/e2e_faster_rcnn_dconv_R_50_FPN_1x.yaml",
        "dcn/e2e_faster_rcnn_mdconv_R_50_FPN_1x.yaml",
        "gn_baselines/e2e_faster_rcnn_R_50_FPN_Xconv1fc_1x_gn.yaml",
    ],
)
def test_dcn_gn_short_train_smoke(config):
    """Short-train smoke: repeated steps on one fixed batch must keep every
    loss finite and reduce the total loss (the model can fit its batch),
    proving the DCN/GN backward passes are wired, not merely buildable."""
    from maskrcnn_tpu.engine.train_step import make_train_step
    from maskrcnn_tpu.solver import make_optimizer

    c = tiny(cfg.clone())
    c.merge_from_file(os.path.join(CONFIG_DIR, config))
    c = tiny(c)
    c.SOLVER.BASE_LR = 0.02
    c.SOLVER.WARMUP_ITERS = 0
    c.freeze()
    model = build_detection_model(c)
    params = model.init(jax.random.PRNGKey(0))
    frozen = model.frozen_mask(params)
    tx, _ = make_optimizer(c, params, frozen)
    opt_state = tx.init(params)
    batch = make_batch(with_targets=True)
    step = make_train_step(model, tx, mesh=None, donate=False)
    losses = []
    for i in range(6):
        params, opt_state, metrics = step(
            params, opt_state, batch, jax.random.PRNGKey(2)
        )
        loss = float(metrics["loss"])
        assert np.isfinite(loss), f"step {i}: non-finite loss"
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"step {i}: non-finite {k}"
        losses.append(loss)
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    if "dconv" in config:
        # the deformable offset weights themselves must have moved
        flat = {
            "/".join(map(str, path)): leaf
            for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        off = [v for k, v in flat.items() if "offset" in k]
        assert off, "no offset params found in a DCN config"


def test_multichip_dryrun():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.heavy
def test_multichip_2d_mesh_hybrid_tp():
    """dp x tp: an 8-device (4 data, 2 model) mesh trains one step with
    output-channel tensor parallelism on the heavy weights (fc/conv last
    dims sharded over 'model'); XLA places the collectives."""
    from jax.sharding import Mesh

    from maskrcnn_tpu.engine.train_step import make_train_step
    from maskrcnn_tpu.parallel.mesh import shard_batch, shard_params, tree_shardings
    from maskrcnn_tpu.solver import make_optimizer

    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "model"))

    c = tiny(cfg.clone())
    c.merge_from_file(os.path.join(CONFIG_DIR, "e2e_mask_rcnn_R_50_FPN_1x.yaml"))
    c = tiny(c)
    c.freeze()
    model = build_detection_model(c)
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(c, params, model.frozen_mask(params))
    opt_state = tx.init(params)

    # the box-head fc weight must actually be model-sharded
    sh = tree_shardings(params, mesh)
    fc_spec = sh["roi_heads"]["box"]["feature_extractor"]["fc6"]["w"].spec
    assert tuple(fc_spec) == (None, "model")

    params = shard_params(params, mesh)
    opt_state = shard_params(opt_state, mesh)
    batch = shard_batch(make_batch(b=4, with_targets=True), mesh)
    step = make_train_step(model, tx, mesh=mesh, donate=False)
    new_params, _, metrics = step(params, opt_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # updated params keep the tensor-parallel layout
    new_fc = new_params["roi_heads"]["box"]["feature_extractor"]["fc6"]["w"]
    assert "model" in tuple(p for p in new_fc.sharding.spec if p)


@pytest.mark.heavy
def test_multichip_dryrun_fullsize():
    """Flagship-shaped (800x1344, production top-k caps) training step
    compiled and executed over an 8-device mesh — validates that the real
    program's shardings (pooler window DMA indices, streaming matcher scan,
    NMS grids) survive batch-dim partitioning, which tiny shapes cannot."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8, full_size=True)"],
        cwd=REPO,
        env={k: v for k, v in dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=8",
            # the ~45-min cold CPU compile of the flagship-shaped program
            # must hit the suite's persistent cache on re-runs (test_cli.py
            # uses the same cache for its subprocesses)
            JAX_COMPILATION_CACHE_DIR=os.environ.get(
                "MASKRCNN_TPU_TEST_CACHE",
                os.path.expanduser("~/.cache/maskrcnn_tpu_xla"),
            ),
            JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1.0",
            JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0",
        ).items() if k != "PALLAS_AXON_POOL_IPS"},
        capture_output=True, text=True, timeout=4800,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    assert "full-size) OK on 8 devices" in r.stdout, r.stdout[-2000:]


def test_positive_roi_compaction_preserves_losses():
    """Cross-image compaction (TPU.MASK_ROI_CAP / KEYPOINT_ROI_CAP) must not
    change the mask loss as long as every valid positive fits in the
    budget: the loss normalizes over valid rows, so packing them across
    images is a pure layout change (models/detector.py:_compact_positives).
    One image carries all the gt, the other none, so the valid positives
    (<= 4, the tiny per-image quota) fit a binding 3-per-image cap."""
    from maskrcnn_tpu.models.detector import GeneralizedRCNN

    base = tiny(cfg.clone())
    base.merge_from_file(
        os.path.join(CONFIG_DIR, "e2e_mask_rcnn_R_50_FPN_1x.yaml")
    )
    base = tiny(base)

    batch = make_batch(with_targets=True)
    # image 1: no ground truth -> no positives from it
    gl = np.asarray(batch["gt_labels"]).copy()
    gl[1] = 0
    batch = dict(batch, gt_labels=jnp.asarray(gl))

    losses = {}
    for cap in (0, 3):  # 0 = disabled; 3/image -> budget 6 < the 8 pad rows
        c = base.clone()
        c.TPU.MASK_ROI_CAP = cap
        c.freeze()
        model = GeneralizedRCNN(c)
        params = model.init(jax.random.PRNGKey(0))
        out = jax.jit(model.train_forward)(
            params, batch, jax.random.PRNGKey(1)
        )
        losses[cap] = {k: float(v) for k, v in out.items()}

    for k in losses[0]:
        assert np.isclose(losses[0][k], losses[3][k], rtol=1e-5), (
            k, losses[0][k], losses[3][k]
        )
