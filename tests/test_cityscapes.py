"""CityScapesDataset (poly + mask modes) and the native instance-level
evaluator, against a synthetic gtFine fixture with known geometry."""

import numpy as np
import pytest

from synthetic_cityscapes import make_synthetic_cityscapes

from maskrcnn_tpu.data.datasets import CityScapesDataset
from maskrcnn_tpu.data.evaluation import evaluate
from maskrcnn_tpu.data.evaluation.cityscapes_eval import (
    OVERLAPS,
    evaluate_matches,
    match_gts_with_preds,
)
from maskrcnn_tpu.structures.boxlist import BoxList
from maskrcnn_tpu.structures.segmentation_mask import SegmentationMask


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("cityscapes")
    img_root, ann_root, insts = make_synthetic_cityscapes(str(root))
    return img_root, ann_root, insts


def test_poly_dataset_geometry(fixture):
    img_root, ann_root, insts = fixture
    ds = CityScapesDataset(img_root, ann_root, "val", mode="poly")
    assert len(ds) == len(insts)
    img, target, idx = ds[0]
    assert idx == 0
    exp = insts[0]
    assert len(target) == len(exp)  # group/sky objects dropped
    for i, (name, (x0, y0, x1, y1)) in enumerate(exp):
        np.testing.assert_allclose(
            target.bbox[i], [x0, y0, x1 - 1, y1 - 1]
        )
        assert ds.CLASSES[target.get_field("labels")[i]] == name
    masks = target.get_field("masks")
    assert masks.mode == "poly"
    m = masks.get_mask_tensor()
    for i, (_, (x0, y0, x1, y1)) in enumerate(exp):
        area = int(np.asarray(m[i]).sum())
        assert (x1 - x0 - 1) * (y1 - y0 - 1) <= area <= (x1 - x0) * (y1 - y0)


def test_mask_dataset_matches_poly(fixture):
    img_root, ann_root, insts = fixture
    dsp = CityScapesDataset(img_root, ann_root, "val", mode="poly")
    dsm = CityScapesDataset(img_root, ann_root, "val", mode="mask")
    assert len(dsm) == len(dsp)
    for idx in range(len(dsm)):
        _, tp, _ = dsp[idx]
        _, tm, _ = dsm[idx]
        assert sorted(np.asarray(tp.get_field("labels")).tolist()) == sorted(
            np.asarray(tm.get_field("labels")).tolist()
        )
        # same instysances (disjoint rectangles): box sets must coincide
        bp = {tuple(b) for b in np.asarray(tp.bbox, int).tolist()}
        bm = {tuple(b) for b in np.asarray(tm.bbox, int).tolist()}
        assert bp == bm
        assert tm.get_field("masks").mode == "mask"


def test_min_area_filter(fixture):
    img_root, ann_root, insts = fixture
    ds_all = CityScapesDataset(img_root, ann_root, "val", mode="poly")
    ds = CityScapesDataset(
        img_root, ann_root, "val", mode="poly", min_area=30 * 30
    )
    _, t0, _ = ds_all[0]
    _, t1, i1 = ds[0]
    areas = [
        (b[2] - b[0]) * (b[3] - b[1]) for b in np.asarray(t1.bbox)
    ]
    assert all(a >= 30 * 30 * 0.8 for a in areas)  # inclusive-coord slack
    assert len(t1) <= len(t0)


def _perfect_predictions(ds, mask_field=True):
    preds = []
    for idx in range(len(ds)):
        _, target, _ = ds[idx]
        target = target.convert("xyxy")
        n = len(target)
        p = BoxList(np.asarray(target.bbox, np.float32), target.size, "xyxy")
        p.add_field("labels", np.asarray(target.get_field("labels")))
        p.add_field("scores", np.linspace(0.95, 0.6, n).astype(np.float32))
        if mask_field:
            masks = target.get_field("masks")
            probs = []
            for j in range(n):
                inst = masks[j]
                patch = inst.crop(target.bbox[j]).resize((28, 28))
                m = np.asarray(patch.get_mask_tensor(), np.float32)
                probs.append(m[0] if m.ndim == 3 else m)
            p.add_field("mask", np.stack(probs)[:, None])
        preds.append(p)
    return preds


def test_eval_perfect_predictions(fixture, tmp_path):
    img_root, ann_root, _ = fixture
    ds = CityScapesDataset(img_root, ann_root, "val", mode="poly")
    preds = _perfect_predictions(ds)
    results = evaluate(
        ds, preds, str(tmp_path), iou_types=("bbox", "segm")
    )
    assert results["bbox"]["allAp50%"] == pytest.approx(1.0)
    assert results["segm"]["allAp50%"] == pytest.approx(1.0)
    assert (tmp_path / "evaluationResults" / "boxResult.json").exists()
    assert (tmp_path / "evaluationResults" / "maskResult.json").exists()


def test_eval_ap_hand_computed(fixture):
    """One class, two gts, three predictions: two exact matches (scores .9
    and .8) and one false positive between them (score .85). The stepwise
    PR integration of the cityscapes protocol gives AP = 19/24."""
    img_root, ann_root, _ = fixture

    class TinyDataset(CityScapesDataset):
        def __init__(self):  # bypass file scanning
            self.CLASSES = ("__background__", "car")
            self.name_to_id = {"__background__": 0, "car": 1}
            self.id_to_name = {0: "__background__", 1: "car"}
            self.items = []

        def __len__(self):
            return 1

        def get_img_info(self, index):
            return {"height": 128, "width": 256}

        def __getitem__(self, idx):
            t = BoxList(
                np.asarray([[10, 10, 60, 60], [100, 10, 160, 70]], np.float32),
                (256, 128), "xyxy",
            )
            t.add_field("labels", np.asarray([1, 1]))
            return None, t, idx

    ds = TinyDataset()
    p = BoxList(
        np.asarray(
            [[10, 10, 60, 60], [100, 10, 160, 70], [10, 90, 40, 120]],
            np.float32,
        ),
        (256, 128), "xyxy",
    )
    p.add_field("labels", np.asarray([1, 1, 1]))
    p.add_field("scores", np.asarray([0.9, 0.8, 0.85], np.float32))

    matches = match_gts_with_preds(ds, [p])
    ap = evaluate_matches(matches, list(ds.CLASSES), "box")
    # every overlap threshold behaves identically (exact matches)
    for oi in range(len(OVERLAPS)):
        assert ap[0, 1, oi] == pytest.approx(19.0 / 24.0)
    assert np.isnan(ap[0, 0, 0])  # background: no gt, no pred

def test_expected_results_gate(fixture, tmp_path):
    # the acceptance gate must actually bind for cityscapes datasets
    img_root, ann_root, _ = fixture
    ds = CityScapesDataset(img_root, ann_root, "val", mode="poly")
    preds = _perfect_predictions(ds)
    # passing gate: allAp50% == 1.0 within tolerance
    evaluate(
        ds, preds, str(tmp_path), iou_types=("bbox",),
        expected_results=[("bbox", "allAp50%", 1.0, 0.01)],
        expected_results_sigma_tol=4,
    )
    with pytest.raises(AssertionError, match="FAILED"):
        evaluate(
            ds, preds, str(tmp_path), iou_types=("bbox",),
            expected_results=[("bbox", "allAp50%", 0.2, 0.01)],
            expected_results_sigma_tol=4,
        )
