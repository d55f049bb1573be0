"""End-to-end: dataset -> loader -> train (loss decreases) -> eval (AP).

The closest thing to the reference's quick_schedules regression runs that
fits in CI: overfit a tiny synthetic COCO dataset and require (a) the loss
to drop and (b) evaluation AP on the training set to be non-trivial.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maskrcnn_tpu.config import cfg
from maskrcnn_tpu.data.collate import BatchCollator
from maskrcnn_tpu.data.datasets import COCODataset
from maskrcnn_tpu.data.transforms import build_transforms
from maskrcnn_tpu.engine.train_step import make_train_step
from maskrcnn_tpu.models import build_detection_model
from maskrcnn_tpu.solver import make_optimizer

from synthetic_coco import make_synthetic_coco

pytestmark = pytest.mark.heavy

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def small_cfg():
    c = cfg.clone()
    c.merge_from_file(os.path.join(CONFIG_DIR, "e2e_faster_rcnn_R_50_FPN_1x.yaml"))
    c.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 4
    c.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 200
    c.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 100
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = 128
    c.MODEL.RPN.PRE_NMS_TOP_N_TEST = 200
    c.MODEL.RPN.POST_NMS_TOP_N_TEST = 100
    c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 100
    c.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 10
    c.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 5  # tiny data: train heads only
    c.TPU.MAX_GT_BOXES = 8
    c.INPUT.MIN_SIZE_TRAIN = (120,)
    c.INPUT.MAX_SIZE_TRAIN = 160
    c.INPUT.MIN_SIZE_TEST = 120
    c.INPUT.MAX_SIZE_TEST = 160
    # random-init training needs unit-variance inputs (the Caffe2
    # PIXEL_STD=1 convention only works with pretrained conv1)
    c.INPUT.PIXEL_STD = [57.375, 57.12, 58.395]
    c.SOLVER.BASE_LR = 1e-4
    c.SOLVER.WARMUP_ITERS = 10
    c.SOLVER.WARMUP_FACTOR = 0.1
    c.SOLVER.MOMENTUM = 0.9
    c.DATALOADER.SIZE_DIVISIBILITY = 32
    return c


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_coco")
    img_dir, ann_file = make_synthetic_coco(str(root), num_images=4)
    return img_dir, ann_file


def test_loader_batches(synth):
    img_dir, ann_file = synth
    c = small_cfg()
    ds = COCODataset(ann_file, img_dir, True, build_transforms(c, is_train=True))
    assert len(ds) == 4
    collator = BatchCollator(c, is_train=True)
    batch = collator([ds[0], ds[1]])
    assert batch["images"].ndim == 4
    assert batch["gt_boxes"].shape == (2, 8, 4)
    assert (batch["gt_labels"] > 0).sum() >= 2
    # boxes scaled to the resized image and inside it
    h, w = batch["image_sizes"][0]
    gt = batch["gt_boxes"][0][batch["gt_labels"][0] > 0]
    assert (gt[:, 2] <= w).all() and (gt[:, 3] <= h).all()


def test_overfit_loss_decreases(synth):
    img_dir, ann_file = synth
    c = small_cfg()
    c.freeze()
    ds = COCODataset(ann_file, img_dir, True, build_transforms(c, is_train=True))
    collator = BatchCollator(c, is_train=True)
    items = [ds[i] for i in range(len(ds))]
    batch = collator(items)
    arrays = {k: jnp.asarray(v) for k, v in batch.items() if k != "indices"}

    model = build_detection_model(c)
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(c, params, model.frozen_mask(params))
    opt_state = tx.init(params)
    step = make_train_step(model, tx, mesh=None, donate=False)

    losses = []
    for i in range(40):
        params, opt_state, m = step(params, opt_state, arrays, jax.random.PRNGKey(42))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    assert last < 0.8 * first, (first, last, losses)


def test_tta_inference_path(synth, tmp_path):
    """inference() with TEST.BBOX_AUG.ENABLED drives the multi-scale/flip
    path end to end (loader -> bbox_aug -> merge -> COCO eval)."""
    img_dir, ann_file = synth
    c = small_cfg()
    c.TEST.BBOX_AUG.ENABLED = True
    c.TEST.BBOX_AUG.H_FLIP = True
    c.TEST.BBOX_AUG.SCALES = ()
    c.TEST.IMS_PER_BATCH = 2
    c.DATALOADER.NUM_WORKERS = 0
    c.freeze()

    catalog = tmp_path / "catalog.py"
    catalog.write_text(
        "class DatasetCatalog:\n"
        "    @staticmethod\n"
        "    def get(name):\n"
        "        return dict(factory='COCODataset', args=dict(\n"
        "            root={!r}, ann_file={!r},\n"
        "            remove_images_without_annotations=False))\n"
        "class ModelCatalog:\n"
        "    @staticmethod\n"
        "    def get(name):\n"
        "        raise RuntimeError\n".format(img_dir, ann_file)
    )
    c2 = c.clone()
    c2.PATHS_CATALOG = str(catalog)
    c2.DATASETS.TEST = ("synthetic_val",)
    c2.freeze()

    from maskrcnn_tpu.data import make_data_loader
    from maskrcnn_tpu.engine.inference import inference

    model = build_detection_model(c2)
    params = model.init(jax.random.PRNGKey(0))
    (loader,) = make_data_loader(c2, is_train=False)
    results = inference(
        model, params, loader, dataset_name="synthetic_val",
        iou_types=("bbox",), output_folder=None, bbox_aug_cfg=c2,
    )
    assert results is not None
    res, _ = results
    assert "bbox" in res.results
