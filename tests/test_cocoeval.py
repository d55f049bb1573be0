"""COCOEvaluator golden cases with hand-computable APs."""

import numpy as np
import pytest

from maskrcnn_tpu.data.evaluation.cocoeval import COCOEvaluator, bbox_iou_xywh


class FakeDataset:
    """Minimal dataset facade for the evaluator."""

    def __init__(self, anns_by_img, sizes, cats=(1,)):
        self.ids = sorted(anns_by_img.keys())
        self.anns_by_img = anns_by_img
        self.imgs = {
            i: {"id": i, "height": sizes[i][0], "width": sizes[i][1]}
            for i in self.ids
        }
        self.categories = {c: "c{}".format(c) for c in cats}


def _gt(img, cat, bbox, iscrowd=0, aid=[0]):
    aid[0] += 1
    return {
        "id": aid[0], "image_id": img, "category_id": cat, "bbox": list(bbox),
        "area": bbox[2] * bbox[3], "iscrowd": iscrowd,
    }


def _dt(img, cat, bbox, score):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox),
            "score": score}


def test_perfect_detection_ap1():
    ds = FakeDataset({1: [_gt(1, 1, (10, 10, 40, 40))]}, {1: (100, 100)})
    ev = COCOEvaluator(ds, "bbox")
    stats = ev.evaluate({1: [_dt(1, 1, (10, 10, 40, 40), 0.9)]})
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AP75"] == pytest.approx(1.0)


def test_iou_60_percent_detection():
    # IoU(dt, gt) computed exactly: shifted box
    gt_box = (10, 10, 40, 40)
    dt_box = (20, 10, 40, 40)  # overlap 30x40 over union 2*1600-1200
    iou = bbox_iou_xywh(
        np.array([dt_box], float), np.array([gt_box], float), [0]
    )[0, 0]
    assert 0.5 < iou < 0.75
    ds = FakeDataset({1: [_gt(1, 1, gt_box)]}, {1: (100, 100)})
    ev = COCOEvaluator(ds, "bbox")
    stats = ev.evaluate({1: [_dt(1, 1, dt_box, 0.9)]})
    # matches at thresholds <= iou, misses above: AP = mean over 10 thresholds
    from maskrcnn_tpu.data.evaluation.cocoeval import IOU_THRS

    n_match = int((IOU_THRS <= iou).sum())
    assert stats["AP"] == pytest.approx(n_match / 10, abs=1e-6)
    assert stats["AP50"] == pytest.approx(1.0)
    assert stats["AP75"] == pytest.approx(0.0)


def test_false_positive_halves_precision():
    ds = FakeDataset({1: [_gt(1, 1, (10, 10, 40, 40))]}, {1: (100, 100)})
    ev = COCOEvaluator(ds, "bbox")
    # high-scoring FP ranked first, then the TP
    stats = ev.evaluate({1: [
        _dt(1, 1, (70, 70, 20, 20), 0.95),
        _dt(1, 1, (10, 10, 40, 40), 0.9),
    ]})
    # 101-pt interp: precision at all recall points = 0.5 (TP is 2nd of 2)
    assert stats["AP50"] == pytest.approx(0.5, abs=0.01)


def test_crowd_gt_not_counted_and_absorbs():
    ds = FakeDataset(
        {1: [_gt(1, 1, (10, 10, 40, 40), iscrowd=1)]}, {1: (100, 100)}
    )
    ev = COCOEvaluator(ds, "bbox")
    # detection inside crowd region: ignored (not FP), but no gt to recall
    stats = ev.evaluate({1: [_dt(1, 1, (12, 12, 36, 36), 0.9)]})
    assert stats["AP"] == -1.0  # no countable gt at all


def test_missed_gt_costs_recall():
    ds = FakeDataset(
        {1: [_gt(1, 1, (10, 10, 40, 40)), _gt(1, 1, (60, 60, 30, 30))]},
        {1: (120, 120)},
    )
    ev = COCOEvaluator(ds, "bbox")
    stats = ev.evaluate({1: [_dt(1, 1, (10, 10, 40, 40), 0.9)]})
    # recall caps at 0.5 -> 101-pt AP = 51/101
    assert stats["AP50"] == pytest.approx(51 / 101, abs=1e-6)


def test_area_ranges():
    # a small (16x16=256 < 32^2) and a large gt
    ds = FakeDataset(
        {1: [_gt(1, 1, (5, 5, 16, 16)), _gt(1, 1, (30, 30, 100, 100))]},
        {1: (200, 200)},
    )
    ev = COCOEvaluator(ds, "bbox")
    stats = ev.evaluate({1: [
        _dt(1, 1, (5, 5, 16, 16), 0.9), _dt(1, 1, (30, 30, 100, 100), 0.8)
    ]})
    assert stats["APs"] == pytest.approx(1.0)
    assert stats["APl"] == pytest.approx(1.0)
    assert stats["APm"] == -1.0  # no medium gt


def test_segm_mode():
    from maskrcnn_tpu.utils import maskops

    m = np.zeros((50, 50), np.uint8)
    m[10:30, 10:30] = 1
    rle = maskops.encode_mask(m)
    ds = FakeDataset(
        {1: [{"id": 1, "image_id": 1, "category_id": 1,
              "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0,
              "segmentation": [[10, 10, 29, 10, 29, 29, 10, 29]]}]},
        {1: (50, 50)},
    )
    ev = COCOEvaluator(ds, "segm")
    stats = ev.evaluate({1: [{
        "image_id": 1, "category_id": 1, "segmentation": rle, "score": 0.9,
        "bbox": [10, 10, 20, 20],
    }]})
    assert stats["AP50"] == pytest.approx(1.0)
