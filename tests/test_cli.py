"""Regression tests for the public CLIs (reference surface:
tools/train_net.py:36-201, tools/test_net.py:27-114).

Each test launches the actual CLI in a subprocess on a synthetic COCO tree
(the dataset catalog resolves coco_2017_train/val under
MASKRCNN_TPU_DATA_DIR), covering the paths no library-level test reaches:
argument/opts parsing, catalog resolution, the SHM multi-process loader
under a real process tree, checkpoint-period saves, kill+resume iteration
continuity, --skip-test, and test_net's --ckpt override.

Heavy: each run compiles the full (tiny-image) train or eval step.
"""

import os
import re
import subprocess
import sys

import pytest

from synthetic_coco import make_synthetic_coco

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SMALL_OPTS = [
    "MODEL.WEIGHT", "",
    "MODEL.ROI_BOX_HEAD.NUM_CLASSES", "4",
    "DATASETS.TRAIN", "('coco_2017_train',)",
    "DATASETS.TEST", "('coco_2017_val',)",
    "MODEL.RPN.PRE_NMS_TOP_N_TRAIN", "200",
    "MODEL.RPN.POST_NMS_TOP_N_TRAIN", "100",
    "MODEL.RPN.PRE_NMS_TOP_N_TEST", "200",
    "MODEL.RPN.POST_NMS_TOP_N_TEST", "100",
    "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "64",
    "MODEL.ROI_HEADS.DETECTIONS_PER_IMG", "10",
    "MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN", "128",
    "MODEL.RPN.FPN_POST_NMS_TOP_N_TEST", "100",
    "MODEL.BACKBONE.FREEZE_CONV_BODY_AT", "5",
    "INPUT.MIN_SIZE_TRAIN", "(120,)",
    "INPUT.MAX_SIZE_TRAIN", "160",
    "INPUT.MIN_SIZE_TEST", "120",
    "INPUT.MAX_SIZE_TEST", "160",
    "SOLVER.IMS_PER_BATCH", "2",
    "SOLVER.BASE_LR", "0.0001",
    "TEST.IMS_PER_BATCH", "2",
    "TPU.MAX_GT_BOXES", "8",
]


def _data_tree(tmp_path):
    """Synthetic COCO laid out exactly as DatasetCatalog expects."""
    import shutil

    root = tmp_path / "datasets"
    img_dir, ann_file = make_synthetic_coco(
        str(tmp_path / "gen"), num_images=6, num_classes=3
    )
    (root / "coco" / "annotations").mkdir(parents=True)
    shutil.move(img_dir, str(root / "coco" / "train2017"))
    shutil.copytree(
        str(root / "coco" / "train2017"), str(root / "coco" / "val2017")
    )
    shutil.copy(
        ann_file, str(root / "coco" / "annotations" / "instances_train2017.json")
    )
    shutil.move(
        ann_file, str(root / "coco" / "annotations" / "instances_val2017.json")
    )
    return root


def _run(script, args, data_root, extra_env=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([REPO, env.get("PYTHONPATH", "")])
    env["MASKRCNN_TPU_DATA_DIR"] = str(data_root)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    # hermetic CPU: without this, an axon-tunnel environment would try to
    # initialize the TPU plugin inside the CPU-only subprocess
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # share the suite's persistent XLA compile cache across CLI subprocesses
    env["JAX_COMPILATION_CACHE_DIR"] = os.environ.get(
        "MASKRCNN_TPU_TEST_CACHE",
        os.path.expanduser("~/.cache/maskrcnn_tpu_xla"),
    )
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"
    env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", script)] + args,
        env=env, capture_output=True, text=True, timeout=1500,
    )


@pytest.mark.heavy
def test_train_net_cli_trains_saves_and_resumes(tmp_path):
    """Short synthetic train with NUM_WORKERS=1 (real SHM loader workers),
    checkpoint-period saves, then a resumed run that must (a) pick up from
    last_checkpoint and (b) continue at the next iteration, as the
    reference's Checkpointer contract requires."""
    data_root = _data_tree(tmp_path)
    out = tmp_path / "out"
    args = [
        "--config-file", os.path.join(REPO, "configs", "e2e_faster_rcnn_R_50_FPN_1x.yaml"),
        "--skip-test",
    ] + SMALL_OPTS + [
        "DATALOADER.NUM_WORKERS", "1",
        "SOLVER.MAX_ITER", "4",
        "SOLVER.CHECKPOINT_PERIOD", "2",
        "OUTPUT_DIR", str(out),
    ]
    r = _run("train_net.py", args, data_root)
    assert r.returncode == 0, r.stderr[-3000:]
    # periodic + final saves and the resume tag exist
    assert (out / "model_0000002.npz").exists(), os.listdir(out)
    assert (out / "model_final.npz").exists()
    assert (out / "last_checkpoint").exists()
    # losses were finite (trainer logs every-iteration metrics)
    logtail = r.stdout + r.stderr
    assert "loss" in logtail
    assert "nan" not in logtail.split("iter: 4")[-1][:400]

    # simulate a kill after iter 4 of 6: bump MAX_ITER and resume
    args2 = [a for a in args]
    args2[args2.index("SOLVER.MAX_ITER") + 1] = "6"
    r2 = _run("train_net.py", args2, data_root)
    assert r2.returncode == 0, r2.stderr[-3000:]
    log2 = r2.stdout + r2.stderr
    # resumed from the final checkpoint of the first run...
    assert re.search(r"Loading checkpoint from .*model_final", log2), log2[-2000:]
    # ...and the first logged iteration continues past the old run
    iters = [int(m) for m in re.findall(r"iter: (\d+)", log2)]
    assert iters and min(iters) >= 5, iters


@pytest.mark.heavy
def test_test_net_cli_with_ckpt_override(tmp_path):
    """test_net.py end-to-end on synthetic val data with --ckpt pointing at
    a weights file (reference tools/test_net.py:51-60 contract), checking
    the COCO-style eval completes and writes results."""
    data_root = _data_tree(tmp_path)
    out = tmp_path / "out"

    # random weights to load via --ckpt
    import jax

    sys.path.insert(0, REPO)
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

    r = _run(
        "test_net.py",
        [
            "--config-file", os.path.join(REPO, "configs", "e2e_faster_rcnn_R_50_FPN_1x.yaml"),
            "--ckpt", str(tmp_path / "weights.npz"),
        ] + SMALL_OPTS + [
            "DATASETS.TEST", "('coco_2017_val',)",
            "OUTPUT_DIR", str(out),
        ],
        data_root,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    log = r.stdout + r.stderr
    assert "Average Precision" in log or "OrderedDict" in log or "bbox" in log, log[-2000:]
