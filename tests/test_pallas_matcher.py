"""Pallas anchor-matcher kernel correctness (interpret mode on CPU; the
compiled kernel is parity-checked on TPU by tools/bench_kernels.py).

Oracle: vmapped ops.matcher.match_anchors_streaming, itself bit-parity
tested against match_proposals/the reference Matcher in test_ops.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maskrcnn_tpu.ops.matcher import match_anchors_streaming
from maskrcnn_tpu.ops.pallas.matcher_kernel import CHUNK, match_anchors_pallas


def _rand_problem(seed, n, b, g, zero_image=False):
    rs = np.random.RandomState(seed)
    anchors = (rs.rand(n, 4) * 500).astype(np.float32)
    anchors[:, 2:] += anchors[:, :2] + 4
    gt = (rs.rand(b, g, 4) * 400).astype(np.float32)
    gt[..., 2:] += gt[..., :2] + 20
    nv = rs.randint(1, g + 1, b)
    gv = np.arange(g)[None, :] < nv[:, None]
    if g > 2:
        gv[0, 1] = False  # validity hole inside the prefix
    if zero_image:
        gv[-1] = False
    return jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(gv)


@pytest.mark.parametrize("zero_image", [False, True])
def test_matcher_kernel_matches_streaming_interpret(zero_image):
    # n > CHUNK exercises the multi-chunk path and column padding
    anchors, gt, gv = _rand_problem(
        0, CHUNK + 700, b=2, g=12, zero_image=zero_image
    )
    ref = jax.vmap(
        lambda g_, v_: match_anchors_streaming(anchors, g_, v_, 0.7, 0.3)
    )(gt, gv)
    out = match_anchors_pallas(anchors, gt, gv, 0.7, 0.3, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_matcher_kernel_low_quality_restore_interpret():
    # a gt whose best anchor IoU is below the low threshold must still
    # claim that anchor (allow_low_quality_matches), including ties
    anchors = jnp.asarray(
        np.array(
            [[0, 0, 10, 10], [100, 100, 140, 140], [200, 200, 210, 210]]
            + [[300 + i, 300, 310 + i, 312] for i in range(5)],
            np.float32,
        )
    )
    anchors = jnp.pad(anchors, ((0, CHUNK - anchors.shape[0]), (0, 0)))
    gt = jnp.asarray(
        np.array([[[101, 101, 139, 139], [0, 0, 200, 200]]], np.float32)
    )
    gv = jnp.ones((1, 2), bool)
    ref = jax.vmap(
        lambda g_, v_: match_anchors_streaming(anchors, g_, v_, 0.7, 0.3)
    )(gt, gv)
    out = match_anchors_pallas(anchors, gt, gv, 0.7, 0.3, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
