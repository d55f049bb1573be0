"""Pallas NMS kernel correctness (interpret mode on CPU; the same kernel is
verified compiled-on-TPU by tools/bench_kernels.py)."""

import numpy as np

import jax.numpy as jnp

from maskrcnn_tpu.ops.nms import nms_numpy
from maskrcnn_tpu.ops.pallas.nms_kernel import nms_mask_pallas, nms_sorted_pallas


def test_sorted_kernel_matches_golden_interpret():
    rng = np.random.RandomState(0)
    n = 256
    ctr = rng.uniform(0, 400, (n, 2))
    wh = rng.uniform(10, 150, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    scores = -np.arange(n, dtype=np.float32)  # already sorted
    keep = np.asarray(
        nms_sorted_pallas(
            jnp.asarray(boxes)[None], jnp.ones((1, n), bool), 0.5, interpret=True
        )
    )[0]
    exp = np.zeros(n, bool)
    exp[nms_numpy(boxes, scores, 0.5)] = True
    np.testing.assert_array_equal(keep, exp)


def test_wrapper_with_padding_and_order_interpret():
    rng = np.random.RandomState(1)
    g, n = 3, 200
    ctr = rng.uniform(0, 300, (g, n, 2))
    wh = rng.uniform(5, 100, (g, n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    scores = rng.uniform(size=(g, n)).astype(np.float32)
    valid = np.ones((g, n), bool)
    valid[:, 170:] = False
    keep = np.asarray(
        nms_mask_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.6,
            interpret=True,
        )
    )
    for lane in range(g):
        exp = np.zeros(n, bool)
        exp[nms_numpy(boxes[lane][:170], scores[lane][:170], 0.6)] = True
        np.testing.assert_array_equal(keep[lane][:170], exp[:170])
        assert not keep[lane][170:].any()


def test_lane_group_24_chunk_alignment_interpret():
    """g=24 selects a 24-wide lane group, whose naive sweep chunk
    (512*8//24 = 170) is not a 128 multiple — Mosaic rejects such dynamic
    lane slices on hardware. Pin that the chunk rounding keeps correctness
    (regression for the keypoint-eval compile failure)."""
    from maskrcnn_tpu.ops.pallas.nms_kernel import BLOCK, LANES, MAX_SWEEP_CHUNK

    assert (max(MAX_SWEEP_CHUNK * LANES // 24, BLOCK) // BLOCK * BLOCK) % BLOCK == 0
    rng = np.random.RandomState(7)
    g, n = 24, 1280
    ctr = rng.uniform(0, 900, (g, n, 2))
    wh = rng.uniform(5, 200, (g, n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    scores = rng.uniform(size=(g, n)).astype(np.float32)
    valid = rng.rand(g, n) > 0.1
    keep = np.asarray(
        nms_mask_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5,
            interpret=True,
        )
    )
    for lane in range(g):
        v = valid[lane]
        exp = np.zeros(n, bool)
        idx = np.nonzero(v)[0]
        kept = nms_numpy(boxes[lane][v], scores[lane][v], 0.5)
        exp[idx[kept]] = True
        np.testing.assert_array_equal(keep[lane], exp)


def test_many_lanes_multirow_interpret():
    """g=40 spans multiple lane-group rows at the widened MAX_LANES, with n
    crossing BLOCK and sweep-chunk boundaries — every lane must still match
    the sequential oracle exactly."""
    rng = np.random.RandomState(2)
    g, n = 40, 300
    ctr = rng.uniform(0, 500, (g, n, 2))
    wh = rng.uniform(5, 120, (g, n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    scores = rng.uniform(size=(g, n)).astype(np.float32)
    valid = rng.rand(g, n) > 0.1
    keep = np.asarray(
        nms_mask_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5,
            interpret=True,
        )
    )
    for lane in range(g):
        v = valid[lane]
        exp = np.zeros(n, bool)
        idx = np.nonzero(v)[0]
        kept = nms_numpy(boxes[lane][v], scores[lane][v], 0.5)
        exp[idx[kept]] = True
        np.testing.assert_array_equal(keep[lane], exp)
