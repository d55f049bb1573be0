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


def test_voc_eval_hand_computed_ap():
    """Golden AP worked out by hand for a curve exercising every rule:
    duplicate suppression, difficult-box ignoring, false positives, and the
    VOC07 11-point vs continuous metrics.

    One class, two images. gt: img0 has one normal box + one difficult box;
    img1 one normal box (2 countable gts). Ranked detections produce
    outcomes [tp, dup-fp, difficult-ignored, fp, tp] ->
    precision [1, 1/2, -, 1/3, 1/2], recall [.5, .5, -, .5, 1].
    VOC07: 6 recall points at p=1 (t<=0.5) + 5 at p=0.5 -> 8.5/11.
    Continuous: 0.5*1 + 0.5*0.5 = 0.75.
    """
    from maskrcnn_tpu.data.evaluation.voc_eval import eval_detection_voc

    size = (100, 100)

    def boxlist(boxes, labels, scores=None, difficult=None):
        b = BoxList(np.asarray(boxes, np.float32).reshape(-1, 4), size)
        b.add_field("labels", np.asarray(labels, np.int64))
        if scores is not None:
            b.add_field("scores", np.asarray(scores, np.float32))
        if difficult is not None:
            b.add_field("difficult", np.asarray(difficult, np.uint8))
        return b

    g1, g2, g3 = [0, 0, 9, 9], [20, 20, 29, 29], [0, 0, 9, 9]
    far = [50, 50, 59, 59]
    gts = [
        boxlist([g1, g2], [1, 1], difficult=[0, 1]),
        boxlist([g3], [1], difficult=[0]),
    ]
    preds = [
        boxlist([g1, g1, g2], [1, 1, 1], scores=[0.9, 0.8, 0.7]),
        boxlist([far, g3], [1, 1], scores=[0.6, 0.5]),
    ]
    r07 = eval_detection_voc(preds, gts, iou_thresh=0.5, use_07_metric=True)
    assert r07["ap"][1] == pytest.approx(8.5 / 11, abs=1e-9)
    rc = eval_detection_voc(preds, gts, iou_thresh=0.5, use_07_metric=False)
    assert rc["ap"][1] == pytest.approx(0.75, abs=1e-9)


def test_voc_eval_class_without_detections_or_gt():
    """A class with gt but no detections scores AP 0; a class with
    detections but no gt anywhere is excluded (nan) from the mean."""
    from maskrcnn_tpu.data.evaluation.voc_eval import eval_detection_voc

    size = (100, 100)
    gt = BoxList(np.asarray([[0, 0, 9, 9]], np.float32), size)
    gt.add_field("labels", np.asarray([1], np.int64))
    gt.add_field("difficult", np.asarray([0], np.uint8))
    pred = BoxList(np.asarray([[0, 0, 9, 9]], np.float32), size)
    pred.add_field("labels", np.asarray([2], np.int64))
    pred.add_field("scores", np.asarray([0.9], np.float32))
    r = eval_detection_voc([pred], [gt], use_07_metric=True)
    assert r["ap"][1] == pytest.approx(0.0)
    assert np.isnan(r["ap"][2])
    assert r["map"] == pytest.approx(0.0)


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
