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

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference not mounted"
)

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
