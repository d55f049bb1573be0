import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskrcnn_tpu.ops import (
    box_iou,
    decode_boxes,
    encode_boxes,
    match_proposals,
    multiclass_nms_mask,
    nms_mask,
    nms_numpy,
    nms_topk,
    roi_align,
    sample_masks,
    sample_topk_indices,
    sigmoid_focal_loss,
    smooth_l1_loss,
)

# The 5-box suppression scenario from caffe2's
# generate_proposals_op_util_nms_test.cc (UtilsNMSTest.TestNMS), the
# numerical contract the reference tests against (tests/test_nms.py:11-57).
GOLDEN_BOXES = np.array(
    [
        [10, 10, 50, 60],
        [11, 12, 48, 60],
        [8, 9, 40, 50],
        [100, 100, 150, 140],
        [99, 110, 155, 139],
    ],
    np.float32,
)
GOLDEN_SCORES = np.array([0.5, 0.7, 0.6, 0.9, 0.8], np.float32)
GOLDEN_CASES = [
    (0.1, [1, 3]),
    (0.3, [1, 3]),
    (0.5, [1, 3]),
    (0.8, [1, 2, 3, 4]),
    (0.9, [0, 1, 2, 3, 4]),
]


@pytest.mark.parametrize("thresh,expected", GOLDEN_CASES)
def test_nms_numpy_golden(thresh, expected):
    keep = np.sort(nms_numpy(GOLDEN_BOXES, GOLDEN_SCORES, thresh))
    np.testing.assert_array_equal(keep, expected)


@pytest.mark.parametrize("thresh,expected", GOLDEN_CASES)
def test_nms_mask_golden(thresh, expected):
    valid = jnp.ones(5, bool)
    keep = nms_mask(jnp.asarray(GOLDEN_BOXES), jnp.asarray(GOLDEN_SCORES), valid, thresh)
    np.testing.assert_array_equal(np.sort(np.nonzero(np.asarray(keep))[0]), expected)


def test_nms_mask_matches_numpy_random():
    rng = np.random.RandomState(0)
    for _ in range(5):
        n = 64
        ctrs = rng.uniform(0, 200, (n, 2))
        whs = rng.uniform(5, 80, (n, 2))
        boxes = np.concatenate([ctrs - whs / 2, ctrs + whs / 2], 1).astype(np.float32)
        scores = rng.uniform(size=n).astype(np.float32)
        expected = np.zeros(n, bool)
        expected[nms_numpy(boxes, scores, 0.5)] = True
        got = np.asarray(
            nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.5)
        )
        np.testing.assert_array_equal(got, expected)


def test_nms_respects_validity_and_padding():
    boxes = jnp.asarray(GOLDEN_BOXES)
    scores = jnp.asarray(GOLDEN_SCORES)
    valid = jnp.array([True, False, True, True, True])
    keep = np.asarray(nms_mask(boxes, scores, valid, 0.5))
    assert not keep[1]
    # with box1 invalid, box0 and box2 compete: box2 (0.6) suppresses box0
    assert keep[2] and keep[3]


def test_nms_topk_shapes():
    b, s, v = nms_topk(
        jnp.asarray(GOLDEN_BOXES), jnp.asarray(GOLDEN_SCORES), jnp.ones(5, bool), 0.5, 4
    )
    assert b.shape == (4, 4) and s.shape == (4,) and v.shape == (4,)
    assert int(v.sum()) == 2


def test_multiclass_nms():
    # same geometry, different labels -> no cross-class suppression
    boxes = jnp.asarray(np.tile(GOLDEN_BOXES[:1], (2, 1)))
    scores = jnp.asarray([0.9, 0.8])
    labels = jnp.asarray([1, 2])
    keep = multiclass_nms_mask(boxes, scores, labels, jnp.ones(2, bool), 0.5)
    assert bool(keep[0]) and bool(keep[1])
    keep_same = multiclass_nms_mask(
        boxes, scores, jnp.asarray([1, 1]), jnp.ones(2, bool), 0.5
    )
    assert bool(keep_same[0]) and not bool(keep_same[1])


def test_box_coder_roundtrip():
    rng = np.random.RandomState(1)
    anchors = rng.uniform(0, 100, (20, 4)).astype(np.float32)
    anchors[:, 2:] = anchors[:, :2] + rng.uniform(5, 50, (20, 2))
    gt = rng.uniform(0, 100, (20, 4)).astype(np.float32)
    gt[:, 2:] = gt[:, :2] + rng.uniform(5, 50, (20, 2))
    weights = (10.0, 10.0, 5.0, 5.0)
    codes = encode_boxes(jnp.asarray(gt), jnp.asarray(anchors), weights)
    decoded = decode_boxes(codes, jnp.asarray(anchors), weights)
    np.testing.assert_allclose(np.asarray(decoded), gt, atol=5e-3)


def test_box_coder_clip():
    # huge dw must be clipped at log(1000/16), not explode
    anchors = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    codes = jnp.asarray([[0.0, 0.0, 50.0, 50.0]])
    out = decode_boxes(codes, anchors)
    assert np.all(np.isfinite(np.asarray(out)))


def test_box_iou_plus_one_convention():
    a = jnp.asarray([[0.0, 0.0, 9.0, 9.0]])  # area 100 with +1
    b = jnp.asarray([[0.0, 0.0, 4.0, 9.0]])  # area 50
    iou = np.asarray(box_iou(a, b))
    np.testing.assert_allclose(iou, [[0.5]], atol=1e-6)


def test_matcher_thresholds_and_low_quality():
    # 2 gt x 4 anchors
    iou = jnp.asarray(
        [
            [0.9, 0.4, 0.25, 0.1],
            [0.0, 0.0, 0.35, 0.2],
        ]
    )
    gt_valid = jnp.array([True, True])
    m = match_proposals(iou, gt_valid, 0.5, 0.3, allow_low_quality_matches=False)
    np.testing.assert_array_equal(np.asarray(m), [0, -2, -2, -1])
    m2 = match_proposals(iou, gt_valid, 0.5, 0.3, allow_low_quality_matches=True)
    # anchor2 is gt1's best match -> restored to 1; anchor0 already matched
    np.testing.assert_array_equal(np.asarray(m2), [0, -2, 1, -1])


def test_streaming_matcher_matches_dense():
    """match_anchors_streaming == match_proposals(box_iou(...)) bit-for-bit,
    including low-quality restores, padded gt, and the chunk-pad tail."""
    from maskrcnn_tpu.ops.matcher import match_anchors_streaming

    rng = np.random.RandomState(7)
    n, g = 1000, 12
    anchors = np.sort(rng.uniform(0, 300, (n, 2, 2)), axis=1).reshape(n, 4)
    anchors = anchors[:, [0, 2, 1, 3]].astype(np.float32)
    gt = np.sort(rng.uniform(0, 300, (g, 2, 2)), axis=1).reshape(g, 4)
    gt = gt[:, [0, 2, 1, 3]].astype(np.float32)
    gt_valid = np.arange(g) < 9

    iou = box_iou(jnp.asarray(gt), jnp.asarray(anchors))
    dense = match_proposals(
        iou, jnp.asarray(gt_valid), 0.7, 0.3, allow_low_quality_matches=True
    )
    # chunk=256 forces a padded tail (1000 % 256 != 0) and multiple chunks
    streamed = match_anchors_streaming(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(gt_valid),
        0.7, 0.3, chunk=256,
    )
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(streamed))


def test_stem_s2d_matches_direct_conv():
    """The space-to-depth stem rewrite computes the identical 7x7/s2/p3
    convolution (same taps, same zero padding) up to summation order."""
    from maskrcnn_tpu.models.resnet import _stem_conv_s2d

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 3, 16).astype(np.float32))
    direct = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    s2d = _stem_conv_s2d(x, {"w": w}, jnp.float32)
    assert s2d.shape == direct.shape
    np.testing.assert_allclose(
        np.asarray(s2d), np.asarray(direct), rtol=1e-5, atol=1e-4
    )


def test_matcher_ignores_padded_gt():
    iou = jnp.asarray([[0.9, 0.8], [0.0, 0.0]])
    gt_valid = jnp.array([True, False])
    m = match_proposals(iou, gt_valid, 0.5, 0.3, allow_low_quality_matches=True)
    np.testing.assert_array_equal(np.asarray(m), [0, 0])


def test_sampler_quotas():
    labels = jnp.asarray([1] * 10 + [0] * 100 + [-1] * 10)
    pos_mask, neg_mask = sample_masks(labels, jax.random.PRNGKey(0), 64, 0.5)
    assert int(pos_mask.sum()) == 10  # fewer positives than quota: take all
    assert int(neg_mask.sum()) == 54  # negatives fill the remainder
    assert not bool((pos_mask & (labels != 1)).any())
    assert not bool((neg_mask & (labels != 0)).any())


def test_sampler_topk_indices():
    labels = jnp.asarray([1] * 3 + [0] * 20)
    idx, valid, is_pos = sample_topk_indices(labels, jax.random.PRNGKey(1), 16, 0.25)
    assert idx.shape == (16,)
    assert int(valid.sum()) == 16
    assert int(is_pos.sum()) == 3
    # positives come first
    assert bool(is_pos[:3].all())


def test_smooth_l1():
    x = jnp.asarray([0.0, 0.05, 1.0])
    t = jnp.zeros(3)
    out = np.asarray(smooth_l1_loss(x, t, beta=1.0 / 9))
    np.testing.assert_allclose(out[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(out[1], 0.5 * 0.05 ** 2 / (1 / 9), rtol=1e-5)
    np.testing.assert_allclose(out[2], 1.0 - 0.5 / 9, rtol=1e-5)


def test_focal_loss_matches_direct_formula():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(8, 5).astype(np.float32))
    targets = jnp.asarray([0, 1, 2, 3, 4, 5, -1, 2])
    gamma, alpha = 2.0, 0.25
    out = np.asarray(sigmoid_focal_loss(logits, targets, gamma, alpha))
    p = 1 / (1 + np.exp(-np.asarray(logits, np.float64)))
    cls_range = np.arange(1, 6)
    t = np.asarray(targets)[:, None]
    is_pos = (t == cls_range).astype(np.float64)
    is_neg = ((t != cls_range) & (t >= 0)).astype(np.float64)
    expected = -is_pos * ((1 - p) ** gamma) * np.log(p) * alpha - is_neg * (
        p ** gamma
    ) * np.log(1 - p) * (1 - alpha)
    np.testing.assert_allclose(out, expected, atol=1e-4)
    assert np.all(out[6] == 0)  # ignored target contributes nothing


def _roi_align_reference(feat, rois, output_size, scale, ratio):
    """Direct per-sample loop mirroring csrc/cuda/ROIAlign_cuda.cu math."""
    k = rois.shape[0]
    h, w, c = feat.shape[1:]
    out = np.zeros((k, output_size, output_size, c), np.float64)
    for r in range(k):
        x1, y1, x2, y2 = rois[r] * scale
        rw = max(x2 - x1, 1.0)
        rh = max(y2 - y1, 1.0)
        bh = rh / output_size
        bw = rw / output_size
        for ph in range(output_size):
            for pw in range(output_size):
                acc = np.zeros(c)
                for iy in range(ratio):
                    y = y1 + ph * bh + (iy + 0.5) * bh / ratio
                    for ix in range(ratio):
                        x = x1 + pw * bw + (ix + 0.5) * bw / ratio
                        if y < -1 or y > h or x < -1 or x > w:
                            continue
                        yy, xx = max(y, 0), max(x, 0)
                        y0, x0 = int(yy), int(xx)
                        y0 = min(y0, h - 1)
                        x0 = min(x0, w - 1)
                        y1_, x1_ = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        if y0 >= h - 1:
                            yy = float(y0)
                        if x0 >= w - 1:
                            xx = float(x0)
                        ly, lx = yy - y0, xx - x0
                        acc += (
                            (1 - ly) * (1 - lx) * feat[0, y0, x0]
                            + (1 - ly) * lx * feat[0, y0, x1_]
                            + ly * (1 - lx) * feat[0, y1_, x0]
                            + ly * lx * feat[0, y1_, x1_]
                        )
                out[r, ph, pw] = acc / (ratio * ratio)
    return out


def test_roi_align_matches_reference_math():
    rng = np.random.RandomState(3)
    feat = rng.randn(1, 16, 16, 3).astype(np.float32)
    rois = np.array(
        [[0, 0, 32, 32], [8, 8, 100, 90], [5.5, 3.2, 50.7, 61.1]], np.float32
    )
    got = np.asarray(
        roi_align(
            jnp.asarray(feat),
            jnp.asarray(rois),
            jnp.zeros(3, jnp.int32),
            7,
            0.25,
            sampling_ratio=2,
        )
    )
    expected = _roi_align_reference(feat, rois, 7, 0.25, 2)
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_roi_align_batch_indexing():
    rng = np.random.RandomState(4)
    feat = rng.randn(2, 8, 8, 2).astype(np.float32)
    rois = np.array([[0, 0, 16, 16], [0, 0, 16, 16]], np.float32)
    out = np.asarray(
        roi_align(
            jnp.asarray(feat),
            jnp.asarray(rois),
            jnp.asarray([0, 1], jnp.int32),
            4,
            0.5,
            sampling_ratio=2,
        )
    )
    assert not np.allclose(out[0], out[1])
    # roi on image 1 must only read from image 1
    expected1 = _roi_align_reference(feat[1:2], rois[:1], 4, 0.5, 2)
    np.testing.assert_allclose(out[1], expected1[0], atol=1e-4)


def test_roi_align_grad_flows():
    feat = jnp.ones((1, 8, 8, 1), jnp.float32)
    rois = jnp.asarray([[0.0, 0.0, 7.0, 7.0]])

    def f(x):
        return roi_align(x, rois, jnp.zeros(1, jnp.int32), 2, 1.0, 2).sum()

    g = jax.grad(f)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_mask_predictor_at_class_matches_full():
    # the train-path per-class predictor must equal full-map + class gather
    from maskrcnn_tpu.models.roi_heads.mask_head import (
        apply_mask_predictor,
        apply_mask_predictor_at_class,
        mask_head_loss,
        mask_head_loss_picked,
    )
    from maskrcnn_tpu.config import cfg

    c = cfg.clone()
    c.MODEL.ROI_MASK_HEAD.PREDICTOR = "MaskRCNNC4Predictor"
    c.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 9
    rng = np.random.RandomState(3)
    r, d, cdim = 6, 16, 9
    params = {
        "conv5_mask": {
            "w": jnp.asarray(rng.randn(2, 2, d, d).astype(np.float32) * 0.1),
            "b": jnp.asarray(rng.randn(d).astype(np.float32) * 0.1),
        },
        "mask_fcn_logits": {
            "w": jnp.asarray(rng.randn(1, 1, d, cdim).astype(np.float32) * 0.1),
            "b": jnp.asarray(rng.randn(cdim).astype(np.float32) * 0.1),
        },
    }
    x = jnp.asarray(rng.randn(r, 7, 7, d).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, cdim, r), jnp.int32)

    full = apply_mask_predictor(params, x, c, compute_dtype=jnp.float32)
    picked_ref = jnp.take_along_axis(full, labels[:, None, None, None], axis=3)[..., 0]
    picked = apply_mask_predictor_at_class(params, x, labels, c, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(picked), np.asarray(picked_ref), atol=1e-5)

    tgt = jnp.asarray((rng.rand(r, 14, 14) > 0.5).astype(np.float32))
    valid = jnp.asarray(rng.rand(r) > 0.3)
    l_full = mask_head_loss(full, tgt, labels, valid)
    l_picked = mask_head_loss_picked(picked, tgt, valid)
    np.testing.assert_allclose(float(l_full), float(l_picked), atol=1e-6)


def test_device_normalize_matches_host_lut():
    # uint8 batch + on-device normalize must equal host LUT Normalize + pad
    from maskrcnn_tpu.config import cfg
    from maskrcnn_tpu.data.transforms import Normalize
    from maskrcnn_tpu.models.detector import GeneralizedRCNN

    c = cfg.clone()
    rs = np.random.RandomState(7)
    h, w, bh, bw = 37, 53, 48, 64
    img = rs.randint(0, 256, (h, w, 3), np.uint8)

    host_norm = Normalize(c.INPUT.PIXEL_MEAN, c.INPUT.PIXEL_STD, c.INPUT.TO_BGR255)
    ref, _ = host_norm(img, None)
    ref_padded = np.zeros((1, bh, bw, 3), np.float32)
    ref_padded[0, :h, :w] = ref

    batch_img = np.zeros((1, bh, bw, 3), np.uint8)
    batch_img[0, :h, :w] = img
    sizes = jnp.asarray([[h, w]], jnp.int32)

    model = GeneralizedRCNN.__new__(GeneralizedRCNN)
    model.pixel_mean = tuple(c.INPUT.PIXEL_MEAN)
    model.pixel_std = tuple(c.INPUT.PIXEL_STD)
    model.to_bgr255 = c.INPUT.TO_BGR255
    got = model._prepare_images(jnp.asarray(batch_img), sizes)
    np.testing.assert_array_equal(np.asarray(got), ref_padded)
    # float32 input passes through untouched
    f32 = jnp.asarray(ref_padded)
    assert model._prepare_images(f32, sizes) is f32


def test_sampler_zero_positive_fraction():
    # POSITIVE_FRACTION=0 used to crash (top_k with k=0 indexed empty array)
    from maskrcnn_tpu.ops.sampler import sample_masks

    labels = jnp.asarray([1, 1, 0, 0, 0, -1, 0, 1], jnp.int32)
    pos, neg = sample_masks(labels, jax.random.PRNGKey(0), 4, 0.0)
    assert int(jnp.sum(pos)) == 0
    assert int(jnp.sum(neg)) == 4


def test_sampler_quota_exact_under_ties():
    # duplicated float32 priorities at the threshold must not over-select
    from maskrcnn_tpu.ops.sampler import _take_quota

    cls = jnp.asarray([True] * 8 + [False] * 2)
    # five entries tied at 0.5, two above, one below
    pri = jnp.asarray(
        [0.9, 0.8, 0.5, 0.5, 0.5, 0.5, 0.5, 0.1, -1e10, -1e10], jnp.float32
    )
    m = _take_quota(cls, pri, jnp.float32(0.5), jnp.asarray(4))
    assert int(jnp.sum(m)) == 4
    # the two strictly-greater entries always selected; ties fill by index
    assert bool(m[0]) and bool(m[1]) and bool(m[2]) and bool(m[3])
    assert not bool(m[7]) and not bool(m[8])
