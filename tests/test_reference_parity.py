"""Numerical parity vs the actual reference implementation (CPU oracle).

Loads the SAME weights into both frameworks and diffs activations — this
validates the model math AND the weight converter in one shot. Float32
compute dtype is forced for tight comparisons.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from maskrcnn_tpu.config import cfg as my_cfg_root  # noqa: E402
from maskrcnn_tpu.utils.c2_loading import load_torchstyle_state  # noqa: E402

from ref_oracle import fresh_ref_cfg, reference_available, torch_state_to_numpy  # noqa: E402

pytestmark = [
    pytest.mark.heavy,
    pytest.mark.skipif(not reference_available(), reason="reference not mounted"),
]

YAML = "/root/reference/configs/e2e_mask_rcnn_R_50_FPN_1x.yaml"


def _my_cfg(yaml=YAML, opts=()):
    c = my_cfg_root.clone()
    c.merge_from_file(yaml)
    c.merge_from_list(list(opts))
    c.TPU.COMPUTE_DTYPE = "float32"
    return c


def test_roi_align_matches_reference_kernel():
    import torch

    from ref_oracle import build_ref_extension
    from maskrcnn_tpu.ops import roi_align

    ext = build_ref_extension()
    rng = np.random.RandomState(0)
    feat = rng.randn(1, 13, 17, 8).astype(np.float32)  # NHWC
    rois = np.array(
        [[0, 0, 24, 28], [3.3, 2.1, 50.4, 40.2], [10, 10, 11, 11]], np.float32
    )
    ref = ext.roi_align_forward(
        # the raw C++ op assumes contiguous NCHW (the reference's python
        # wrapper guarantees it) — keep the test honest
        torch.from_numpy(np.ascontiguousarray(feat.transpose(0, 3, 1, 2))),
        torch.from_numpy(
            np.concatenate([np.zeros((3, 1), np.float32), rois], axis=1)
        ),
        0.5, 7, 7, 2,
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), jnp.zeros(3, jnp.int32),
                  7, 0.5, sampling_ratio=2)
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_roi_align_adaptive_matches_reference_kernel():
    """sampling_ratio=0 — the reference's per-ROI adaptive ceil(roi/bin)
    grid (ROIAlign_cuda.cu:30-34), exercised across grid counts 1..6 (the
    C4 configs' operating range). The TPU build realizes it with a static
    weighted sample superset; values must still match bit-tight."""
    import torch

    from ref_oracle import build_ref_extension
    from maskrcnn_tpu.ops import roi_align

    ext = build_ref_extension()
    rng = np.random.RandomState(1)
    feat = rng.randn(2, 90, 120, 8).astype(np.float32)  # NHWC
    # spatial_scale 1/16 (C4): roi sizes chosen so ceil(bin) spans 1..6
    rois = np.array(
        [
            [0, 0, 100, 120],       # ~6x8 cells   -> grid 1
            [5, 5, 500, 400],       # ~31x25 cells -> grid 3x2
            [0, 0, 1333, 800],      # 83x50 cells  -> grid 6x4
            [40, 30, 41, 31],       # sub-cell     -> grid 1
            [100, 64, 1000, 780],   # mixed
        ],
        np.float32,
    )
    bidx = np.array([0, 1, 0, 1, 0], np.int32)
    ref = ext.roi_align_forward(
        torch.from_numpy(np.ascontiguousarray(feat.transpose(0, 3, 1, 2))),
        torch.from_numpy(
            np.concatenate([bidx[:, None].astype(np.float32), rois], axis=1)
        ),
        1.0 / 16, 14, 14, 0,
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(bidx),
                  14, 1.0 / 16, sampling_ratio=0)
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_backbone_parity_r50_fpn():
    import torch

    ref_cfg = fresh_ref_cfg(YAML)
    from maskrcnn_benchmark.modeling.backbone import build_backbone as ref_build

    torch.manual_seed(0)
    ref_bb = ref_build(ref_cfg)
    ref_bb.eval()

    x = np.random.RandomState(1).randn(1, 96, 128, 3).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref_bb(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_outs = [o.numpy().transpose(0, 2, 3, 1) for o in ref_outs]

    # import the same weights into my model
    from maskrcnn_tpu.models.backbone import build_backbone as my_build

    c = _my_cfg()
    my_bb = my_build(c)
    params = my_bb.init(jax.random.PRNGKey(0))
    state = torch_state_to_numpy(ref_bb)
    # ref keys look like "body.stem.conv1.weight"; ours expect the
    # "backbone." prefix context — suffix matching handles it.
    params = load_torchstyle_state(state, {"backbone": params})["backbone"]
    outs = my_bb.apply(params, jnp.asarray(x), compute_dtype=jnp.float32)
    assert len(outs) == len(ref_outs)
    for mine, ref in zip(outs, ref_outs):
        mine = np.asarray(mine)
        assert mine.shape == ref.shape
        denom = np.abs(ref).max() + 1e-6
        assert np.abs(mine - ref).max() / denom < 2e-4, (
            mine.shape, np.abs(mine - ref).max(), denom
        )


def test_full_model_inference_parity():
    """Same weights, same image -> same detections (within fp tolerance)."""
    import torch

    opts = [
        "MODEL.RPN.PRE_NMS_TOP_N_TEST", "200",
        "MODEL.RPN.POST_NMS_TOP_N_TEST", "100",
        "MODEL.RPN.FPN_POST_NMS_TOP_N_TEST", "100",
        "MODEL.ROI_HEADS.DETECTIONS_PER_IMG", "20",
        "MODEL.ROI_HEADS.SCORE_THRESH", "0.01",
    ]
    ref_cfg = fresh_ref_cfg(YAML, opts)
    from maskrcnn_benchmark.modeling.detector import build_detection_model as ref_build
    from maskrcnn_benchmark.structures.image_list import to_image_list as ref_to_image_list

    torch.manual_seed(0)
    ref_model = ref_build(ref_cfg)
    ref_model.eval()

    h, w = 224, 256
    x = (np.random.RandomState(2).rand(h, w, 3) * 200 - 100).astype(np.float32)
    with torch.no_grad():
        img_list = ref_to_image_list(
            torch.from_numpy(x.transpose(2, 0, 1)), 32
        )
        (ref_out,) = ref_model(img_list)
    ref_boxes = ref_out.bbox.numpy()
    ref_scores = ref_out.get_field("scores").numpy()
    ref_labels = ref_out.get_field("labels").numpy()

    from maskrcnn_tpu.models import build_detection_model as my_build

    c = _my_cfg(YAML, opts)
    c.freeze()
    my_model = my_build(c)
    params = my_model.init(jax.random.PRNGKey(0))
    state = torch_state_to_numpy(ref_model)
    params = load_torchstyle_state(state, params)

    batch = dict(
        images=jnp.asarray(x[None]),
        image_sizes=jnp.asarray([[h, w]], jnp.int32),
    )
    det = my_model.infer_forward(params, batch)
    v = np.asarray(det["valid"][0])
    my_boxes = np.asarray(det["boxes"][0])[v]
    my_scores = np.asarray(det["scores"][0])[v]
    my_labels = np.asarray(det["labels"][0])[v]

    # order can differ within score ties; match detections greedily
    assert len(my_scores) == len(ref_scores), (len(my_scores), len(ref_scores))
    o1 = np.argsort(-my_scores)
    o2 = np.argsort(-ref_scores)
    np.testing.assert_allclose(my_scores[o1], ref_scores[o2], atol=1e-3)
    np.testing.assert_array_equal(np.sort(my_labels), np.sort(ref_labels))
    used = np.zeros(len(ref_scores), bool)
    for i in range(len(my_scores)):
        found = False
        for j in range(len(ref_scores)):
            if used[j] or my_labels[i] != ref_labels[j]:
                continue
            if abs(my_scores[i] - ref_scores[j]) > 2e-3:
                continue
            if np.abs(my_boxes[i] - ref_boxes[j]).max() < 1.0:
                used[j] = True
                found = True
                break
        assert found, (i, my_boxes[i], my_scores[i], my_labels[i])


def test_weight_import_covers_every_tensor():
    """The converter must map the FULL Mask R-CNN tree bijectively:
    every one of our leaves gets a reference tensor and none are left
    unused (else e.g. a head would silently keep random init)."""
    import torch

    from maskrcnn_tpu.utils.c2_loading import (
        _resolve_convk,
        torchstyle_key_for_path,
    )
    from maskrcnn_tpu.utils.checkpoint import _flatten_params
    from maskrcnn_tpu.utils.model_serialization import (
        align_and_update_state_dicts,
    )

    ref_cfg = fresh_ref_cfg(YAML)
    from maskrcnn_benchmark.modeling.detector import (
        build_detection_model as ref_build,
    )

    torch.manual_seed(0)
    ref_model = ref_build(ref_cfg)
    state = torch_state_to_numpy(ref_model)

    from maskrcnn_tpu.models import build_detection_model as my_build

    c = _my_cfg()
    model = my_build(c)
    params = model.init(jax.random.PRNGKey(0))
    t_flat = _flatten_params(jax.tree.map(np.asarray, params))
    keys = {
        p: _resolve_convk(torchstyle_key_for_path(p), "/" + p + "/")
        for p in t_flat
    }
    match = align_and_update_state_dicts(list(keys.values()), list(state.keys()))
    unmatched = [p for p, k in keys.items() if k not in match]
    assert not unmatched, unmatched[:10]
    used = set(match.values())
    # anchor-generator buffers are constants the reference registers as
    # state; this framework computes anchors statically (models/anchors.py)
    unused = [k for k in state if k not in used and "anchor_generator" not in k]
    assert not unused, unused[:10]


def _match_detections(my_boxes, my_scores, my_labels, ref_boxes, ref_scores,
                      ref_labels, score_atol=2e-3, box_atol=1.0):
    """Greedy score/label/box matching (order within ties may differ).
    Returns my->ref index mapping."""
    assert len(my_scores) == len(ref_scores), (len(my_scores), len(ref_scores))
    np.testing.assert_allclose(
        np.sort(my_scores), np.sort(ref_scores), atol=score_atol
    )
    np.testing.assert_array_equal(np.sort(my_labels), np.sort(ref_labels))
    used = np.zeros(len(ref_scores), bool)
    mapping = {}
    for i in range(len(my_scores)):
        for j in range(len(ref_scores)):
            if used[j] or my_labels[i] != ref_labels[j]:
                continue
            if abs(my_scores[i] - ref_scores[j]) > score_atol:
                continue
            if np.abs(my_boxes[i] - ref_boxes[j]).max() < box_atol:
                used[j] = True
                mapping[i] = j
                break
        assert i in mapping, (i, my_boxes[i], my_scores[i], my_labels[i])
    return mapping


def _run_both_models(yaml, opts, h=224, w=256, seed=2):
    """Build reference + TPU models with identical weights, run one image
    through both in eval mode; returns (ref_out BoxList, my det dict)."""
    import torch

    ref_cfg = fresh_ref_cfg(yaml, opts)
    from maskrcnn_benchmark.modeling.detector import build_detection_model as ref_build
    from maskrcnn_benchmark.structures.image_list import to_image_list as ref_to_image_list

    torch.manual_seed(0)
    ref_model = ref_build(ref_cfg)
    ref_model.eval()

    x = (np.random.RandomState(seed).rand(h, w, 3) * 200 - 100).astype(np.float32)
    with torch.no_grad():
        img_list = ref_to_image_list(torch.from_numpy(x.transpose(2, 0, 1)), 32)
        (ref_out,) = ref_model(img_list)

    from maskrcnn_tpu.models import build_detection_model as my_build

    c = _my_cfg(yaml, opts)
    c.freeze()
    my_model = my_build(c)
    params = my_model.init(jax.random.PRNGKey(0))
    state = torch_state_to_numpy(ref_model)
    params = load_torchstyle_state(state, params)
    batch = dict(
        images=jnp.asarray(x[None]),
        image_sizes=jnp.asarray([[h, w]], jnp.int32),
    )
    det = my_model.infer_forward(params, batch)
    return ref_out, det, x, (ref_model, my_model, params, c)


def _unpack(det):
    v = np.asarray(det["valid"][0])
    return (
        np.asarray(det["boxes"][0])[v],
        np.asarray(det["scores"][0])[v],
        np.asarray(det["labels"][0])[v],
        v,
    )


def test_c4_box_stage_parity():
    """C4-specific stage parity with pinned proposals: the single-level
    POOLER_SAMPLING_RATIO=0 pooler, the ResNet50Conv5 feature extractor and
    the predictor must reproduce the reference's class logits and box
    regression on the same C4 feature map. (Full-model C4 set-equality is
    not stable on a random-init model: its saturated softmax scores make
    the RPN top-k/NMS boundaries ties; COCODemo C4 inference is covered in
    tests/test_demo_and_tta.py.)"""
    import torch

    yaml = "/root/reference/configs/e2e_faster_rcnn_R_50_C4_1x.yaml"
    ref_cfg = fresh_ref_cfg(yaml)
    from maskrcnn_benchmark.modeling.detector import (
        build_detection_model as ref_build,
    )
    from maskrcnn_benchmark.structures.bounding_box import BoxList as RefBoxList

    torch.manual_seed(0)
    ref_model = ref_build(ref_cfg)
    ref_model.eval()

    h, w = 224, 256  # image; C4 map is 14 x 16 at stride 16
    rng = np.random.RandomState(5)
    feat = rng.randn(1, 14, 16, 1024).astype(np.float32)
    props = rng.uniform(0, 200, (32, 4)).astype(np.float32)
    props = np.concatenate(
        [np.minimum(props[:, :2], props[:, 2:]),
         np.maximum(props[:, :2], props[:, 2:]) + 12],
        axis=1,
    )
    bl = RefBoxList(torch.from_numpy(props), (w, h), mode="xyxy")
    with torch.no_grad():
        x = ref_model.roi_heads.box.feature_extractor(
            [torch.from_numpy(np.ascontiguousarray(feat.transpose(0, 3, 1, 2)))],
            [bl],
        )
        ref_logits, ref_reg = ref_model.roi_heads.box.predictor(x)
    ref_logits = ref_logits.numpy()
    ref_reg = ref_reg.numpy()

    from maskrcnn_tpu.models import build_detection_model as my_build
    import maskrcnn_tpu.models.roi_heads.box_head as bh

    c = _my_cfg(yaml)
    c.freeze()
    model = my_build(c)
    params = model.init(jax.random.PRNGKey(0))
    state = torch_state_to_numpy(ref_model)
    params = load_torchstyle_state(state, params)

    logits, reg, _ = bh.run_box_head(
        params["roi_heads"]["box"], [jnp.asarray(feat)],
        jnp.asarray(props), jnp.zeros(32, jnp.int32), model.box_pooler, c,
        jnp.float32,
    )
    scale = np.abs(ref_logits).max() + 1e-6
    assert np.abs(np.asarray(logits) - ref_logits).max() / scale < 2e-4
    rscale = np.abs(ref_reg).max() + 1e-6
    assert np.abs(np.asarray(reg) - ref_reg).max() / rscale < 2e-4


def test_mask_probability_parity():
    """Mask head: per-matched-detection 28x28 probability maps and the
    pasted full-image binary masks must agree with the reference."""
    opts = [
        "MODEL.RPN.PRE_NMS_TOP_N_TEST", "200",
        "MODEL.RPN.POST_NMS_TOP_N_TEST", "100",
        "MODEL.RPN.FPN_POST_NMS_TOP_N_TEST", "100",
        "MODEL.ROI_HEADS.DETECTIONS_PER_IMG", "10",
        "MODEL.ROI_HEADS.SCORE_THRESH", "0.05",
    ]
    ref_out, det, x, _ = _run_both_models(
        "/root/reference/configs/e2e_mask_rcnn_R_50_FPN_1x.yaml", opts
    )
    my_boxes, my_scores, my_labels, v = _unpack(det)
    ref_boxes = ref_out.bbox.numpy()
    mapping = _match_detections(
        my_boxes, my_scores, my_labels,
        ref_boxes, ref_out.get_field("scores").numpy(),
        ref_out.get_field("labels").numpy(),
    )
    ref_masks = ref_out.get_field("mask").numpy()[:, 0]  # [N, M, M] probs
    my_masks = np.asarray(det["masks"][0])[v]
    assert my_masks.shape[1:] == ref_masks.shape[1:]
    for i, j in mapping.items():
        # logits pass through a sigmoid: 1e-2 absolute on probabilities
        # corresponds to ~1e-3 relative on the pre-sigmoid activations
        np.testing.assert_allclose(my_masks[i], ref_masks[j], atol=1e-2)

    # pasted masks agree too (exercises our Masker against the reference's)
    from maskrcnn_benchmark.modeling.roi_heads.mask_head.inference import (
        Masker as RefMasker,
    )
    import torch

    from maskrcnn_tpu.models.masker import Masker
    from maskrcnn_tpu.structures.boxlist import BoxList

    h, w = x.shape[:2]
    bl = BoxList(my_boxes, (w, h), mode="xyxy")
    mine_pasted = Masker(threshold=0.5)(my_masks, bl)
    ref_pasted = RefMasker(threshold=0.5).forward_single_image(
        torch.from_numpy(ref_masks[:, None]), ref_out
    )[:, 0].numpy()
    for i, j in mapping.items():
        diff = (mine_pasted[i] != ref_pasted[j]).mean()
        assert diff < 0.01, (i, diff)


def test_keypoint_decode_parity(monkeypatch):
    """Exact host keypoint decode vs the reference's cv2-bicubic
    heatmaps_to_keypoints (keypoint_head/inference.py:40-98)."""
    from ref_oracle import setup_reference

    setup_reference()
    import cv2

    # the reference passes float dsize (np.ceil results); cv2>=5 rejects it
    orig_resize = cv2.resize
    monkeypatch.setattr(
        cv2, "resize",
        lambda src, dsize, **kw: orig_resize(
            src, tuple(int(v) for v in dsize) if dsize is not None else None,
            **kw,
        ),
    )
    from maskrcnn_benchmark.modeling.roi_heads.keypoint_head.inference import (
        heatmaps_to_keypoints as ref_decode,
    )

    from maskrcnn_tpu.models.roi_heads.keypoint_head import (
        heatmaps_to_keypoints_exact,
    )

    rng = np.random.RandomState(3)
    maps = rng.randn(4, 17, 56, 56).astype(np.float32)  # reference is NCHW
    rois = np.array(
        [
            [10.3, 20.7, 90.9, 180.2],
            [0, 0, 30, 30],
            [5, 5, 5.4, 8.0],     # sub-pixel roi
            [50, 60, 250, 140],
        ],
        np.float32,
    )
    ref_xy, ref_scores = ref_decode(maps, rois)
    mine = heatmaps_to_keypoints_exact(maps.transpose(0, 2, 3, 1), rois)
    np.testing.assert_allclose(mine[:, :, :2], ref_xy[:, :, :2], atol=1e-3)
    np.testing.assert_allclose(mine[:, :, 3], ref_scores, atol=1e-4)


def test_train_loss_parity():
    """Same weights, same image, same gt -> same loss values, with the
    random subsampling pinned by quotas larger than the candidate counts
    (both samplers then keep everything, deterministically). Covers
    rpn/loss.py:92-131 and box_head/loss.py:118-193 end to end."""
    import torch

    yaml = "/root/reference/configs/e2e_faster_rcnn_R_50_FPN_1x.yaml"
    # Quotas are pinned to the EXACT candidate-array sizes: the TPU build's
    # fixed-shape sampler top_k requires k <= array length, and both
    # samplers keep every candidate once the quota covers them all.
    # 14328 = 3 anchors x (56x64 + 28x32 + 14x16 + 7x8 + 4x4) at 224x256;
    # 104 = FPN_POST_NMS_TOP_N_TRAIN (100) + TPU.MAX_GT_BOXES (4).
    opts = [
        "MODEL.RPN.PRE_NMS_TOP_N_TRAIN", "200",
        "MODEL.RPN.POST_NMS_TOP_N_TRAIN", "100",
        "MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN", "100",
        "MODEL.RPN.BATCH_SIZE_PER_IMAGE", "14328",
        "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "104",
        "MODEL.ROI_HEADS.POSITIVE_FRACTION", "0.9",
    ]
    ref_cfg = fresh_ref_cfg(yaml, opts)
    from maskrcnn_benchmark.modeling.detector import build_detection_model as ref_build
    from maskrcnn_benchmark.structures.bounding_box import BoxList as RefBoxList
    from maskrcnn_benchmark.structures.image_list import to_image_list as ref_to_image_list

    torch.manual_seed(0)
    ref_model = ref_build(ref_cfg)
    ref_model.train()

    h, w = 224, 256
    x = (np.random.RandomState(4).rand(h, w, 3) * 200 - 100).astype(np.float32)
    gt = np.array(
        [[30, 40, 120, 160], [140, 60, 240, 200], [10, 10, 60, 50]],
        np.float32,
    )
    gt_labels = np.array([3, 17, 52], np.int64)
    target = RefBoxList(torch.from_numpy(gt), (w, h), mode="xyxy")
    target.add_field("labels", torch.from_numpy(gt_labels))
    img_list = ref_to_image_list(torch.from_numpy(x.transpose(2, 0, 1)), 32)
    ref_losses = ref_model(img_list, [target])
    ref_losses = {k: float(v) for k, v in ref_losses.items()}

    from maskrcnn_tpu.models import build_detection_model as my_build

    c = _my_cfg(yaml, opts)
    c.TPU.MAX_GT_BOXES = 4
    c.freeze()
    model = my_build(c)
    params = model.init(jax.random.PRNGKey(0))
    state = torch_state_to_numpy(ref_model)
    params = load_torchstyle_state(state, params)

    g = c.TPU.MAX_GT_BOXES
    gt_pad = np.zeros((1, g, 4), np.float32)
    gt_pad[0, :3] = gt
    lab_pad = np.zeros((1, g), np.int32)
    lab_pad[0, :3] = gt_labels
    batch = dict(
        images=jnp.asarray(x[None]),
        image_sizes=jnp.asarray([[h, w]], jnp.int32),
        gt_boxes=jnp.asarray(gt_pad),
        gt_labels=jnp.asarray(lab_pad),
    )
    my_losses = model.train_forward(params, batch, jax.random.PRNGKey(0))
    my_losses = {k: float(v) for k, v in my_losses.items()}

    # RPN losses see the identical anchor set -> tight. The head losses
    # sit downstream of NMS/top-k tie-breaking on a random-init model whose
    # objectness scores are densely tied, so the sampled proposal SETS can
    # differ by a couple of boxes; 3% still catches any normalization or
    # matching bug (those are >=10% effects). Exact head-loss math is
    # covered by test_box_head_loss_module_parity below with pinned
    # proposals.
    for k, tol in (("loss_objectness", 5e-3), ("loss_rpn_box_reg", 5e-3),
                   ("loss_classifier", 3e-2), ("loss_box_reg", 3e-2)):
        rel = abs(my_losses[k] - ref_losses[k]) / max(abs(ref_losses[k]), 1e-6)
        assert rel < tol, (k, my_losses[k], ref_losses[k])


def test_box_head_loss_module_parity():
    """Box-head target preparation + losses with a PINNED proposal set:
    matching, encoding, subsampling (quota covers all candidates) and the
    CE / smooth-l1 normalizations must agree exactly with the reference's
    loss evaluator (box_head/loss.py:15-193). Logits are a deterministic
    function of each framework's own sampled ROIs, so ROI ordering
    differences cancel."""
    import torch

    yaml = "/root/reference/configs/e2e_faster_rcnn_R_50_FPN_1x.yaml"
    n_props, n_cls = 64, 81
    opts = [
        "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", str(n_props),
        "MODEL.ROI_HEADS.POSITIVE_FRACTION", "0.9",
    ]
    rng = np.random.RandomState(7)
    h, w = 224, 256
    props = rng.uniform(0, 200, (n_props, 4)).astype(np.float32)
    props = np.concatenate(
        [np.minimum(props[:, :2], props[:, 2:]),
         np.maximum(props[:, :2], props[:, 2:]) + 8],
        axis=1,
    )
    gt = np.array([[30, 40, 120, 160], [140, 60, 230, 200]], np.float32)
    # make sure some proposals are clear fg
    props[0] = gt[0] + [2, -3, 4, 1]
    props[1] = gt[1] + [-1, 2, -2, 5]
    gt_labels = np.array([5, 44], np.int64)
    w1 = rng.randn(4, n_cls).astype(np.float32) * 0.02
    w2 = rng.randn(4, n_cls * 4).astype(np.float32) * 0.01

    def logits_of(rois):
        rois = np.asarray(rois, np.float32)
        return np.tanh(rois / 100.0) @ w1, np.tanh(rois / 77.0) @ w2

    # --- reference side ---
    ref_cfg = fresh_ref_cfg(yaml, opts)
    from maskrcnn_benchmark.modeling.roi_heads.box_head.loss import (
        make_roi_box_loss_evaluator,
    )
    from maskrcnn_benchmark.structures.bounding_box import BoxList as RefBoxList

    evaluator = make_roi_box_loss_evaluator(ref_cfg)
    proposal_bl = RefBoxList(torch.from_numpy(props), (w, h), mode="xyxy")
    target_bl = RefBoxList(torch.from_numpy(gt), (w, h), mode="xyxy")
    target_bl.add_field("labels", torch.from_numpy(gt_labels))
    (sampled,) = evaluator.subsample([proposal_bl], [target_bl])
    cls, reg = logits_of(sampled.bbox.numpy())
    ref_cls_loss, ref_box_loss = evaluator(
        [torch.from_numpy(cls)], [torch.from_numpy(reg)]
    )

    # --- TPU side ---
    import maskrcnn_tpu.models.roi_heads.box_head as bh

    c = _my_cfg(yaml, opts)
    targets = bh.prepare_box_targets(
        jnp.asarray(props[None]),
        jnp.ones((1, n_props), bool),
        jnp.asarray(gt[None]),
        jnp.asarray(gt_labels[None].astype(np.int32)),
        jax.random.PRNGKey(0),
        c.MODEL.ROI_HEADS.FG_IOU_THRESHOLD,
        c.MODEL.ROI_HEADS.BG_IOU_THRESHOLD,
        n_props,
        0.9,
        tuple(c.MODEL.ROI_HEADS.BBOX_REG_WEIGHTS),
    )
    my_cls, my_reg = logits_of(np.asarray(targets["rois"].reshape(-1, 4)))
    my_cls_loss, my_box_loss = bh.box_head_loss(
        jnp.asarray(my_cls), jnp.asarray(my_reg), targets
    )
    assert abs(float(my_cls_loss) - float(ref_cls_loss)) < 1e-4, (
        float(my_cls_loss), float(ref_cls_loss)
    )
    assert abs(float(my_box_loss) - float(ref_box_loss)) < 1e-4, (
        float(my_box_loss), float(ref_box_loss)
    )


def test_retinanet_full_model_inference_parity():
    """RetinaNet single-stage path: same weights, same image -> same
    detections (reference retinanet/inference.py:59-174). At random init
    the prior-prob bias puts every sigmoid score near 0.01, so the
    inference threshold is dropped and the candidate set kept small to
    stay off top-k tie boundaries."""
    import torch

    yaml = "/root/reference/configs/retinanet/retinanet_R-50-FPN_1x.yaml"
    opts = [
        "MODEL.RETINANET.INFERENCE_TH", "0.00001",
        "MODEL.RETINANET.PRE_NMS_TOP_N", "100",
        "TEST.DETECTIONS_PER_IMG", "20",
    ]
    ref_cfg = fresh_ref_cfg(yaml, opts)
    from maskrcnn_benchmark.modeling.detector import build_detection_model as ref_build
    from maskrcnn_benchmark.structures.image_list import to_image_list as ref_to_image_list

    torch.manual_seed(0)
    ref_model = ref_build(ref_cfg)
    ref_model.eval()

    h, w = 224, 256
    x = (np.random.RandomState(5).rand(h, w, 3) * 200 - 100).astype(np.float32)
    with torch.no_grad():
        img_list = ref_to_image_list(torch.from_numpy(x.transpose(2, 0, 1)), 32)
        (ref_out,) = ref_model(img_list)
    ref_boxes = ref_out.bbox.numpy()
    ref_scores = ref_out.get_field("scores").numpy()
    ref_labels = ref_out.get_field("labels").numpy()

    from maskrcnn_tpu.models import build_detection_model as my_build

    c = _my_cfg(yaml, opts)
    c.freeze()
    my_model = my_build(c)
    params = my_model.init(jax.random.PRNGKey(0))
    state = torch_state_to_numpy(ref_model)
    params = load_torchstyle_state(state, params)

    batch = dict(
        images=jnp.asarray(x[None]),
        image_sizes=jnp.asarray([[h, w]], jnp.int32),
    )
    det = my_model.infer_forward(params, batch)
    v = np.asarray(det["valid"][0])
    my_boxes = np.asarray(det["boxes"][0])[v]
    my_scores = np.asarray(det["scores"][0])[v]
    my_labels = np.asarray(det["labels"][0])[v]

    assert len(my_scores) == len(ref_scores), (len(my_scores), len(ref_scores))
    o1 = np.argsort(-my_scores)
    o2 = np.argsort(-ref_scores)
    np.testing.assert_allclose(my_scores[o1], ref_scores[o2], atol=1e-3)
    np.testing.assert_array_equal(np.sort(my_labels), np.sort(ref_labels))
    used = np.zeros(len(ref_scores), bool)
    for i in range(len(my_scores)):
        found = False
        for j in range(len(ref_scores)):
            if used[j] or my_labels[i] != ref_labels[j]:
                continue
            if abs(my_scores[i] - ref_scores[j]) > 2e-3:
                continue
            if np.abs(my_boxes[i] - ref_boxes[j]).max() < 1.0:
                used[j] = True
                found = True
                break
        assert found, (i, my_boxes[i], my_scores[i], my_labels[i])


def test_backbone_parity_grouped_conv_32x8d():
    """Grouped-convolution (ResNeXt) backbone parity: NUM_GROUPS=32,
    WIDTH_PER_GROUP=8 — the exact path of the zoo's heaviest rows
    (reference MODEL_ZOO.md X-101-32x8d; modeling/backbone/resnet.py:239-344
    routes groups into Conv2d(groups=num_groups)). Run on R-50 stage counts
    to keep the CPU oracle tractable; the grouped math is identical."""
    import torch

    opts = [
        "MODEL.RESNETS.NUM_GROUPS", "32",
        "MODEL.RESNETS.WIDTH_PER_GROUP", "8",
        "MODEL.RESNETS.STRIDE_IN_1X1", "False",
    ]
    ref_cfg = fresh_ref_cfg(YAML)
    ref_cfg.merge_from_list(opts)
    from maskrcnn_benchmark.modeling.backbone import build_backbone as ref_build

    torch.manual_seed(0)
    ref_bb = ref_build(ref_cfg)
    ref_bb.eval()

    x = np.random.RandomState(1).randn(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref_bb(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_outs = [o.numpy().transpose(0, 2, 3, 1) for o in ref_outs]

    from maskrcnn_tpu.models.backbone import build_backbone as my_build

    c = _my_cfg(opts=opts)
    my_bb = my_build(c)
    params = my_bb.init(jax.random.PRNGKey(0))
    state = torch_state_to_numpy(ref_bb)
    params = load_torchstyle_state(state, {"backbone": params})["backbone"]
    outs = my_bb.apply(params, jnp.asarray(x), compute_dtype=jnp.float32)
    assert len(outs) == len(ref_outs)
    for mine, ref in zip(outs, ref_outs):
        mine = np.asarray(mine)
        assert mine.shape == ref.shape
        denom = np.abs(ref).max() + 1e-6
        assert np.abs(mine - ref).max() / denom < 2e-4, (
            mine.shape, np.abs(mine - ref).max(), denom
        )


def test_x101_config_builds_and_infers():
    """The real zoo X-101-32x8d config (MODEL_ZOO.md:24,28) builds and runs
    a jitted tiny-image inference end-to-end (101-layer grouped backbone +
    FPN + heads) with finite outputs."""
    c = _my_cfg("/root/reference/configs/e2e_faster_rcnn_X_101_32x8d_FPN_1x.yaml")
    c.MODEL.WEIGHT = ""
    c.merge_from_list([
        "INPUT.MIN_SIZE_TEST", "64", "INPUT.MAX_SIZE_TEST", "96",
        "MODEL.RPN.PRE_NMS_TOP_N_TEST", "50",
        "MODEL.RPN.POST_NMS_TOP_N_TEST", "20",
        "MODEL.ROI_HEADS.DETECTIONS_PER_IMG", "10",
    ])
    assert c.MODEL.RESNETS.NUM_GROUPS == 32
    assert c.MODEL.RESNETS.WIDTH_PER_GROUP == 8
    from maskrcnn_tpu.models import build_detection_model

    model = build_detection_model(c)
    params = model.init(jax.random.PRNGKey(0))
    batch = {
        "images": jnp.asarray(
            np.random.RandomState(0).randn(1, 64, 96, 3), jnp.float32
        ),
        "image_sizes": jnp.asarray([[64, 96]], jnp.int32),
    }
    det = jax.jit(model.infer_forward)(params, batch)
    assert np.isfinite(np.asarray(det["scores"])).all()
    assert det["boxes"].shape[-1] == 4
