"""tools/eval_zoo.py — the pre-staged real-COCO acceptance runner.

The real run needs zoo weights + COCO annotations (not available in this
environment); these tests rehearse every stage on synthetic data: explicit
--ann-file/--img-dir dataset injection, checkpoint load, full inference,
COCO evaluation, and the TEST.EXPECTED_RESULTS gate (pass and fail)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from synthetic_coco import make_synthetic_coco

pytestmark = pytest.mark.heavy

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

SMALL_OPTS = [
    "MODEL.WEIGHT", "",
    "MODEL.ROI_BOX_HEAD.NUM_CLASSES", "4",
    "MODEL.RPN.PRE_NMS_TOP_N_TEST", "200",
    "MODEL.RPN.POST_NMS_TOP_N_TEST", "100",
    "MODEL.RPN.FPN_POST_NMS_TOP_N_TEST", "100",
    "MODEL.ROI_HEADS.DETECTIONS_PER_IMG", "10",
    "TPU.MAX_GT_BOXES", "8",
    "INPUT.MIN_SIZE_TEST", "120",
    "INPUT.MAX_SIZE_TEST", "160",
    "TEST.IMS_PER_BATCH", "2",
    "DATALOADER.NUM_WORKERS", "0",
]


def _run(tmp_path, expected):
    img_dir, ann_file = make_synthetic_coco(
        str(tmp_path / "data"), num_images=4, num_classes=3
    )
    # random-init weight file: rehearses the checkpoint-load stage
    import jax

    from maskrcnn_tpu.config import cfg
    from maskrcnn_tpu.models import build_detection_model
    from maskrcnn_tpu.utils.checkpoint import Checkpointer

    c = cfg.clone()
    c.merge_from_file(os.path.join(REPO, "configs", "e2e_faster_rcnn_R_50_FPN_1x.yaml"))
    c.merge_from_list(list(SMALL_OPTS))
    model = build_detection_model(c)
    params = model.init(jax.random.PRNGKey(0))
    ck = Checkpointer(save_dir=str(tmp_path), save_to_disk=True)
    ck.save("weights", params)

    cmd = [
        sys.executable, os.path.join(REPO, "tools", "eval_zoo.py"),
        "--config-file", os.path.join(REPO, "configs", "e2e_faster_rcnn_R_50_FPN_1x.yaml"),
        "--weight", str(tmp_path / "weights.npz"),
        "--ann-file", ann_file, "--img-dir", img_dir,
        "--output-dir", str(tmp_path / "out"),
    ] + SMALL_OPTS + [
        "TEST.EXPECTED_RESULTS", repr(expected),
    ]
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # hermetic CPU subprocess
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = os.pathsep.join([REPO, env.get("PYTHONPATH", "")])
    # share the suite's persistent XLA compile cache (same as test_cli.py)
    env["JAX_COMPILATION_CACHE_DIR"] = os.environ.get(
        "MASKRCNN_TPU_TEST_CACHE",
        os.path.expanduser("~/.cache/maskrcnn_tpu_xla"),
    )
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"
    env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
    return subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=1200
    )


@pytest.mark.timeout(1300)
def test_eval_zoo_gate_pass_and_fail(tmp_path):
    # random weights score ~0 AP: a (0 +/- wide) band passes...
    r = _run(tmp_path / "pass", [["bbox", "AP", 0.0, 0.05]])
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "EXPECTED_RESULTS gate passed" in r.stdout + r.stderr

    # ...and the zoo band must make the same run fail loudly
    r = _run(tmp_path / "fail", [["bbox", "AP", 0.378, 0.005]])
    assert r.returncode != 0
    assert "FAILED" in r.stdout + r.stderr
