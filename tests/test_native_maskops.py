import numpy as np
import pytest

native = pytest.importorskip("maskrcnn_tpu.utils._maskops_native")

from maskrcnn_tpu.ops.nms import nms_numpy  # noqa: E402
from maskrcnn_tpu.utils import maskops  # noqa: E402


def _py_rasterize(polys, h, w):
    """The cv2-based python implementation (bypasses the native override)."""
    import cv2

    mask = np.zeros((h * 5, w * 5), np.uint8)
    pts = []
    for poly in polys:
        p = np.asarray(poly, np.float64).reshape(-1, 2)
        if p.shape[0] < 3:
            continue
        pts.append(np.floor(5.0 * p + 0.5).astype(np.int64).reshape(-1, 1, 2))
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask.reshape(h, 5, w, 5).max(axis=(1, 3))


def test_native_square():
    m = native.polygons_to_mask([[2, 2, 8, 2, 8, 8, 2, 8]], 12, 12)
    assert m.sum() == 49
    assert m[2, 2] == 1 and m[8, 8] == 1 and m[1, 1] == 0


def test_native_matches_python_rasterizer():
    rng = np.random.RandomState(0)
    for _ in range(10):
        n = rng.randint(3, 9)
        pts = rng.uniform(2, 48, (n, 2))
        ctr = pts.mean(0)
        ang = np.arctan2(pts[:, 1] - ctr[1], pts[:, 0] - ctr[0])
        pts = pts[np.argsort(ang)]  # simple (convex-ish) ordering
        poly = [pts.reshape(-1).tolist()]
        a = native.polygons_to_mask(poly, 50, 50)
        b = _py_rasterize(poly, 50, 50)
        inter = np.logical_and(a, b).sum()
        union = np.logical_or(a, b).sum()
        diff = union - inter
        # boundary conventions may differ by a ring of pixels at most
        assert union == 0 or inter / union > 0.95 or diff <= 4, (inter, union)


def test_native_run_intersection():
    rng = np.random.RandomState(1)
    a = (rng.rand(31, 17) > 0.5).astype(np.uint8)
    b = (rng.rand(31, 17) > 0.5).astype(np.uint8)
    ca = maskops.mask_to_rle_counts(a)
    cb = maskops.mask_to_rle_counts(b)
    assert native.run_intersection(ca, cb) == int(np.logical_and(a, b).sum())


def test_native_nms_matches_numpy():
    rng = np.random.RandomState(2)
    n = 100
    ctr = rng.uniform(0, 200, (n, 2))
    wh = rng.uniform(5, 80, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(size=n).astype(np.float32)
    np.testing.assert_array_equal(
        np.sort(native.nms(boxes, scores, 0.5)),
        np.sort(nms_numpy(boxes, scores, 0.5)),
    )


def test_paste_encode_mask_matches_python_path():
    """Fused native paste+RLE == cv2-based paste_mask_in_image + encode_mask
    pixel-for-pixel, including boxes hanging off every image edge and
    degenerate sub-pixel boxes."""
    from maskrcnn_tpu.models.masker import paste_mask_in_image
    from maskrcnn_tpu.utils import maskops

    rs = np.random.RandomState(0)
    cases = []
    for _ in range(25):
        h, w = rs.randint(30, 200), rs.randint(30, 200)
        box = np.sort(rs.uniform(-20, max(h, w) + 20, (2, 2)), axis=0)
        cases.append((h, w, np.array([box[0, 0], box[0, 1], box[1, 0], box[1, 1]])))
    cases.append((50, 60, np.array([10.2, 10.7, 10.9, 11.1])))  # sub-pixel
    cases.append((50, 60, np.array([-30.0, -30.0, -5.0, -5.0])))  # fully out
    for h, w, box in cases:
        m = rs.rand(28, 28).astype(np.float32)
        ref = paste_mask_in_image(m, box, h, w)
        rle = maskops.paste_encode_mask(m, box, h, w)
        got = maskops.decode_rle(rle)
        np.testing.assert_array_equal(got, ref)
