"""Pascal VOC dataset + evaluation runtime coverage."""

import numpy as np
import pytest

from maskrcnn_tpu.data.datasets import PascalVOCDataset
from maskrcnn_tpu.data.evaluation.voc_eval import do_voc_evaluation
from maskrcnn_tpu.structures import BoxList

from synthetic_voc import make_synthetic_voc


@pytest.fixture(scope="module")
def voc(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc") / "VOC2007"
    make_synthetic_voc(str(root))
    return str(root)


def test_voc_dataset_loads(voc):
    ds = PascalVOCDataset(voc, "test", use_difficult=True)
    assert len(ds) == 4
    img, target, idx = ds[0]
    assert target.has_field("labels") and target.has_field("difficult")
    info = ds.get_img_info(0)
    assert info["width"] == 160 and info["height"] == 120
    # class names mapped
    for label in np.asarray(target.get_field("labels")):
        assert ds.map_class_id_to_class_name(int(label)) in ds.CLASSES


def test_voc_eval_perfect_predictions(voc):
    ds = PascalVOCDataset(voc, "test", use_difficult=True)
    preds = []
    for i in range(len(ds)):
        gt = ds.get_groundtruth(i)
        p = BoxList(gt.bbox.copy(), gt.size, gt.mode)
        p.add_field("labels", np.asarray(gt.get_field("labels")))
        p.add_field("scores", np.ones(len(gt), np.float32))
        preds.append(p)
    result = do_voc_evaluation(ds, preds, output_folder=None)
    assert result["map"] == pytest.approx(1.0, abs=1e-6)


def test_voc_eval_penalizes_misses(voc):
    ds = PascalVOCDataset(voc, "test", use_difficult=True)
    preds = []
    for i in range(len(ds)):
        gt = ds.get_groundtruth(i)
        # drop every detection: mAP must be 0
        p = BoxList(np.zeros((0, 4), np.float32), gt.size, gt.mode)
        p.add_field("labels", np.zeros((0,), np.int64))
        p.add_field("scores", np.zeros((0,), np.float32))
        preds.append(p)
    result = do_voc_evaluation(ds, preds, output_folder=None)
    assert result["map"] == pytest.approx(0.0, abs=1e-6)
