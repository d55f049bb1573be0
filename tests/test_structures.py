import numpy as np

from maskrcnn_tpu.structures import (
    BoxList,
    FLIP_LEFT_RIGHT,
    ImageList,
    SegmentationMask,
    boxlist_iou,
    boxlist_nms,
    cat_boxlist,
    to_image_list,
)
from maskrcnn_tpu.utils import maskops


def make_boxlist():
    boxes = np.array([[10, 10, 50, 60], [30, 20, 80, 90]], np.float32)
    bl = BoxList(boxes, (100, 120), mode="xyxy")
    bl.add_field("scores", np.array([0.9, 0.8], np.float32))
    return bl


def test_boxlist_convert_roundtrip():
    bl = make_boxlist()
    xywh = bl.convert("xywh")
    np.testing.assert_allclose(xywh.bbox[0], [10, 10, 41, 51])
    back = xywh.convert("xyxy")
    np.testing.assert_allclose(back.bbox, bl.bbox)


def test_boxlist_resize_and_flip():
    bl = make_boxlist()
    resized = bl.resize((200, 240))
    np.testing.assert_allclose(resized.bbox[0], [20, 20, 100, 120])
    flipped = bl.transpose(FLIP_LEFT_RIGHT)
    np.testing.assert_allclose(flipped.bbox[0], [100 - 50 - 1, 10, 100 - 10 - 1, 60])


def test_boxlist_clip_and_area():
    boxes = np.array([[-10, -10, 150, 160], [10, 10, 20, 20]], np.float32)
    bl = BoxList(boxes, (100, 120), "xyxy").clip_to_image()
    assert bl.bbox[:, 0].min() >= 0
    assert bl.bbox[:, 2].max() <= 99
    areas = bl.area()
    np.testing.assert_allclose(areas[1], 11 * 11)


def test_boxlist_nms_and_cat():
    bl = make_boxlist()
    kept = boxlist_nms(bl, 0.5)
    assert len(kept) >= 1
    both = cat_boxlist([bl, bl])
    assert len(both) == 4
    iou = boxlist_iou(bl, bl)
    np.testing.assert_allclose(np.diag(iou), [1.0, 1.0], atol=1e-6)


def test_to_image_list_padding():
    imgs = [np.ones((37, 53, 3), np.float32), np.ones((40, 30, 3), np.float32)]
    il = to_image_list(imgs, size_divisible=32)
    assert il.tensors.shape == (2, 64, 64, 3)
    assert il.image_sizes == [(37, 53), (40, 30)]
    assert il.tensors[0, 36, 52, 0] == 1 and il.tensors[0, 38, 0, 0] == 0
    il2 = to_image_list(imgs, size_divisible=32, target_shape=(128, 128))
    assert il2.tensors.shape == (2, 128, 128, 3)


def test_segmentation_mask_rasterize_box():
    # 10x10 axis-aligned square polygon
    poly = [[2, 2, 8, 2, 8, 8, 2, 8]]
    sm = SegmentationMask([poly], (12, 12), mode="poly")
    m = sm.get_mask_tensor()
    assert m.shape == (12, 12)
    assert m[5, 5] == 1 and m[0, 0] == 0
    area = m.sum()
    assert 40 <= area <= 55  # 7x7 with COCO boundary-inclusive semantics

    flipped = sm.transpose(FLIP_LEFT_RIGHT)
    mf = flipped.get_mask_tensor()
    np.testing.assert_array_equal(mf, m[:, ::-1])


def test_segmentation_mask_crop_resize():
    poly = [[2, 2, 8, 2, 8, 8, 2, 8]]
    sm = SegmentationMask([poly], (12, 12), mode="poly")
    cropped = sm.crop([2, 2, 10, 10])
    assert cropped.size == (8, 8)
    resized = sm.resize((24, 24))
    m = resized.get_mask_tensor()
    assert m.shape == (24, 24)


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = (rng.rand(23, 31) > 0.6).astype(np.uint8)
    rle = maskops.encode_mask(mask)
    back = maskops.decode_rle(rle)
    np.testing.assert_array_equal(back, mask)
    assert maskops.rle_area(rle) == int(mask.sum())


def test_rle_string_format_small():
    # hand-checkable: 3x3 all-zero mask -> single run of 9 zeros
    rle = maskops.encode_mask(np.zeros((3, 3), np.uint8))
    counts = maskops.rle_string_to_counts(rle["counts"])
    np.testing.assert_array_equal(counts, [9])


def test_rle_iou():
    a = np.zeros((10, 10), np.uint8)
    a[:5] = 1
    b = np.zeros((10, 10), np.uint8)
    b[2:7] = 1
    ra, rb = maskops.encode_mask(a), maskops.encode_mask(b)
    iou = maskops.rle_iou([ra], [rb])
    np.testing.assert_allclose(iou, [[30 / 70]], atol=1e-9)
    crowd = maskops.rle_iou([ra], [rb], iscrowd=[True])
    np.testing.assert_allclose(crowd, [[30 / 50]], atol=1e-9)


def test_mask_to_polygon_roundtrip():
    """mask -> poly conversion (BinaryMaskList.convert_to_polygon) followed
    by re-rasterization recovers the original masks."""
    import numpy as np

    from maskrcnn_tpu.structures.segmentation_mask import SegmentationMask

    h, w = 60, 80
    m = np.zeros((2, h, w), np.uint8)
    m[0, 10:40, 15:50] = 1                 # rectangle
    m[1, 5:25, 5:30] = 1                   # L-shape
    m[1, 25:50, 5:15] = 1
    sm = SegmentationMask(m, (w, h), mode="mask")
    poly = sm.convert("poly")
    assert poly.mode == "poly"
    back = np.asarray(poly.get_mask_tensor()).astype(bool)
    orig = m.astype(bool)
    for i in range(2):
        inter = (back[i] & orig[i]).sum()
        union = (back[i] | orig[i]).sum()
        assert inter / union > 0.9, (i, inter / union)
