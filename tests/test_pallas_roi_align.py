"""Pallas ROIAlign kernel correctness (interpret mode on CPU; compiled-TPU
validation lives in tools/bench_kernels.py / the parity scripts)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maskrcnn_tpu.models.poolers import PoolerConfig, multilevel_roi_align
from maskrcnn_tpu.ops.pallas.roi_align_kernel import multilevel_roi_align_pallas


def _setup(c=128, r=24):
    rs = np.random.RandomState(0)
    feats = [
        jnp.asarray(rs.randn(2, 64, 80, c), jnp.float32),
        jnp.asarray(rs.randn(2, 32, 40, c), jnp.float32),
        jnp.asarray(rs.randn(2, 16, 20, c), jnp.float32),
        jnp.asarray(rs.randn(2, 8, 10, c), jnp.float32),
    ]
    pcfg = PoolerConfig(7, (0.25, 0.125, 0.0625, 0.03125), 2)
    ctr = rs.uniform(20, 220, (r, 2))
    wh = rs.uniform(10, 120, (r, 2))
    rois = jnp.asarray(np.concatenate([ctr - wh / 2, ctr + wh / 2], -1), jnp.float32)
    bidx = jnp.asarray(rs.randint(0, 2, r), jnp.int32)
    return feats, pcfg, rois, bidx


def test_gather_pooler_roi_chunking_identical():
    """The ROI-chunked gather path (forced via a tiny threshold) must be
    numerically equivalent to the direct vectorized path — same math per
    chunk; XLA may fuse the lax.map body differently, so agreement is to
    float32 ulp, not bitwise. This is the C4-train memory guard (a batch-8
    adaptive C4 pooler would otherwise materialize a ~59 GB sample tensor).
    Also checks grads agree through the lax.map."""
    from maskrcnn_tpu.models import poolers as P

    feats, pcfg, rois, bidx = _setup()
    direct = multilevel_roi_align(feats, rois, bidx, pcfg, compute_dtype=jnp.float32)
    old = P._CHUNK_THRESHOLD_BYTES
    P._CHUNK_THRESHOLD_BYTES = 1024
    try:
        chunked = multilevel_roi_align(
            feats, rois, bidx, pcfg, compute_dtype=jnp.float32
        )
        cot = jnp.asarray(
            np.random.RandomState(1).randn(*direct.shape), jnp.float32
        )
        gc = jax.grad(
            lambda fs: (multilevel_roi_align(
                list(fs), rois, bidx, pcfg, compute_dtype=jnp.float32
            ) * cot).sum()
        )(feats)
    finally:
        P._CHUNK_THRESHOLD_BYTES = old
    gd = jax.grad(
        lambda fs: (multilevel_roi_align(
            list(fs), rois, bidx, pcfg, compute_dtype=jnp.float32
        ) * cot).sum()
    )(feats)
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(direct), rtol=1e-5, atol=1e-5
    )
    for a, b in zip(gc, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # adaptive single-level (the real C4 configuration), chunked vs direct
    pcfg4 = PoolerConfig(7, (0.0625,), 0)
    f4 = [feats[2]]
    d4 = multilevel_roi_align(f4, rois, bidx, pcfg4, compute_dtype=jnp.float32)
    P._CHUNK_THRESHOLD_BYTES = 1024
    try:
        c4 = multilevel_roi_align(f4, rois, bidx, pcfg4, compute_dtype=jnp.float32)
    finally:
        P._CHUNK_THRESHOLD_BYTES = old
    np.testing.assert_allclose(
        np.asarray(c4), np.asarray(d4), rtol=1e-5, atol=1e-5
    )


def test_c4_matmul_pooler_matches_gather():
    """The C4 dense-matmul pooler (single-level adaptive, per-image ROI
    blocks -> two batched MXU contractions) must match the exact gather
    path. Covers in-map ROIs, edge-hugging ROIs (boundary snap), ROIs
    larger than the feature map (clamping), and the ROI-chunked variant;
    also grad parity through both formulations."""
    from maskrcnn_tpu.models import poolers as P

    c = 128
    rs = np.random.RandomState(3)
    feat = jnp.asarray(rs.randn(2, 16, 20, c), jnp.float32)
    pcfg = PoolerConfig(7, (0.0625,), 0)  # stride-16 adaptive (C4 contract)
    k = 8
    ctr = rs.uniform(10, 300, (2 * k, 2))
    wh = rs.uniform(8, 400, (2 * k, 2))
    rois_np = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1)
    rois_np[0] = [0.0, 0.0, 319.0, 255.0]   # whole image
    rois_np[1] = [300.0, 240.0, 340.0, 270.0]  # straddles the right/bottom edge
    rois = jnp.asarray(rois_np, jnp.float32)
    bidx = jnp.asarray(np.repeat(np.arange(2), k), jnp.int32)

    ref = multilevel_roi_align([feat], rois, bidx, pcfg, compute_dtype=jnp.float32)
    got = multilevel_roi_align(
        [feat], rois, bidx, pcfg, compute_dtype=jnp.float32, rois_per_image=k
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)

    # grads agree between the two formulations
    cot = jnp.asarray(rs.randn(*ref.shape), jnp.float32)
    g_ref = jax.grad(
        lambda f: (multilevel_roi_align(
            [f], rois, bidx, pcfg, compute_dtype=jnp.float32
        ) * cot).sum()
    )(feat)
    g_got = jax.grad(
        lambda f: (multilevel_roi_align(
            [f], rois, bidx, pcfg, compute_dtype=jnp.float32, rois_per_image=k
        ) * cot).sum()
    )(feat)
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_ref), atol=2e-3, rtol=1e-3
    )

    # forced ROI chunking (kc < k): the lax.map+checkpoint branch must
    # match the one-shot result
    old = P._CHUNK_THRESHOLD_BYTES
    P._CHUNK_THRESHOLD_BYTES = 2 * 2 * 7 * 20 * 128 * 4 * 2  # kc = 2
    try:
        chunked = multilevel_roi_align(
            [feat], rois, bidx, pcfg, compute_dtype=jnp.float32,
            rois_per_image=k,
        )
    finally:
        P._CHUNK_THRESHOLD_BYTES = old
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(got), atol=1e-5, rtol=1e-5
    )

    # per-image block consistency: pooling the first half of each image's
    # block alone must reproduce the corresponding rows
    one = np.asarray(got)
    half = multilevel_roi_align(
        [feat], rois.reshape(2, k, 4)[:, : k // 2].reshape(-1, 4),
        jnp.asarray(np.repeat(np.arange(2), k // 2), jnp.int32),
        pcfg, compute_dtype=jnp.float32, rois_per_image=k // 2,
    )
    np.testing.assert_allclose(
        np.asarray(half),
        one.reshape(2, k, 7, 7, c)[:, : k // 2].reshape(-1, 7, 7, c),
        atol=2e-4, rtol=1e-4,
    )


def test_pallas_pooler_matches_gather_interpret():
    feats, pcfg, rois, bidx = _setup()
    ref = multilevel_roi_align(feats, rois, bidx, pcfg, compute_dtype=jnp.float32)
    got = multilevel_roi_align_pallas(
        feats, rois, bidx, pcfg, compute_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


@pytest.mark.parametrize("bwd_impl", ["rmw", "roi", "scatter", "chunk"])
def test_pallas_trainable_pooler_grads_match_gather(bwd_impl):
    """The custom_vjp backward (window-merged RMW kernel / XLA windowed
    scatter) must produce the same feature gradients as autodiff through
    the exact gather pooler."""
    from maskrcnn_tpu.ops.pallas.roi_align_kernel import make_trainable_roi_align

    feats, pcfg, rois, bidx = _setup()
    cot = jnp.asarray(
        np.random.RandomState(1).randn(rois.shape[0], 7, 7, 128), jnp.float32
    )

    def loss_gather(fs):
        out = multilevel_roi_align(
            list(fs), rois, bidx, pcfg, compute_dtype=jnp.float32
        )
        return (out * cot).sum()

    fn = make_trainable_roi_align(
        pcfg, compute_dtype=jnp.float32, bwd_impl=bwd_impl, interpret=True
    )

    def loss_pallas(fs):
        return (fn(tuple(fs), rois, bidx).astype(jnp.float32) * cot).sum()

    g_ref = jax.grad(loss_gather)(feats)
    g_got = jax.grad(loss_pallas)(feats)
    for gr, gg in zip(g_ref, g_got):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gr), atol=2e-3, rtol=1e-3
        )


@pytest.mark.parametrize("bwd_impl", ["rmw", "roi", "chunk"])
def test_pallas_pooler_bf16_grads_bounded_error(bwd_impl):
    """bf16 compute path (the default training config): feature gradients
    must stay close to the exact f32 gather-autodiff gradients even when
    MANY ROIs share one window — the window accumulator is f32, so the only
    bf16 roundings are per-ROI dpatch inputs and the single flush, not an
    N-long chain-sum (advisor round-4 finding)."""
    from maskrcnn_tpu.ops.pallas.roi_align_kernel import make_trainable_roi_align

    feats, pcfg, _, _ = _setup()
    # 48 ROIs clustered in one small region of image 0 -> they sort into a
    # handful of shared windows, the worst case for accumulator swamping
    rs = np.random.RandomState(7)
    ctr = rs.uniform(100, 130, (48, 2))
    wh = rs.uniform(20, 40, (48, 2))
    rois = jnp.asarray(np.concatenate([ctr - wh / 2, ctr + wh / 2], -1), jnp.float32)
    bidx = jnp.zeros(48, jnp.int32)
    cot = jnp.asarray(rs.randn(48, 7, 7, 128), jnp.float32)

    def loss_gather(fs):
        out = multilevel_roi_align(
            list(fs), rois, bidx, pcfg, compute_dtype=jnp.float32
        )
        return (out * cot).sum()

    fn = make_trainable_roi_align(
        pcfg, compute_dtype=jnp.bfloat16, bwd_impl=bwd_impl, interpret=True
    )

    def loss_pallas(fs):
        return (fn(tuple(fs), rois, bidx).astype(jnp.float32) * cot).sum()

    g_ref = jax.grad(loss_gather)(feats)
    g_got = jax.grad(loss_pallas)(feats)
    for gr, gg in zip(g_ref, g_got):
        gr = np.asarray(gr)
        gg = np.asarray(gg, np.float32)
        scale = np.abs(gr).max() + 1e-6
        # bf16 inputs/flush bound the error at ~2^-8 of the gradient scale;
        # a bf16 chain-sum over ~48 stacked ROIs would blow well past this
        assert np.abs(gg - gr).max() <= 3e-2 * scale


def test_pallas_pooler_channel_constraint():
    feats, pcfg, rois, bidx = _setup(c=64)
    with pytest.raises(AssertionError):
        multilevel_roi_align_pallas(
            feats, rois, bidx, pcfg, compute_dtype=jnp.float32, interpret=True
        )


def test_pallas_pooler_unaligned_shapes_edge_rois():
    """Level dims where (dim - PATCH_*) is NOT a multiple of 8 (e.g. the real
    R-50-FPN 100x168 / 50x84 maps). Regression: the window-origin clip bound
    used to be unaligned, so clipped edge-ROI origins collided with the
    neighboring 8-aligned origin in the //8 merge key and pooled from the
    wrong window."""
    c = 128
    rs = np.random.RandomState(1)
    feats = [
        jnp.asarray(rs.randn(1, 100, 168, c), jnp.float32),
        jnp.asarray(rs.randn(1, 50, 84, c), jnp.float32),
    ]
    pcfg = PoolerConfig(7, (0.25, 0.125), 2)
    # ROIs hugging the bottom/right image edges (origin clipping territory),
    # plus interior ones sharing the adjacent aligned window
    rois = jnp.asarray(
        [
            # the conflation pair: raw y0 = 40 vs y0 = 48-clipped-to-44 —
            # same //8 merge key, DIFFERENT true origins (bound 100-56=44)
            [100.0, 165.0, 160.0, 250.0],
            [100.0, 200.0, 160.0, 280.0],
            [590.0, 330.0, 665.0, 395.0],   # bottom-right corner, level 0
            [600.0, 20.0, 668.0, 90.0],     # right edge (x bound 168-56=112)
            [10.0, 340.0, 80.0, 398.0],     # bottom edge
            [400.0, 200.0, 660.0, 396.0],   # big -> level 1, corner
            [30.0, 40.0, 90.0, 110.0],      # interior control
            [620.0, 350.0, 667.0, 399.0],   # small corner box
        ],
        jnp.float32,
    )
    bidx = jnp.zeros(8, jnp.int32)
    ref = multilevel_roi_align(feats, rois, bidx, pcfg, compute_dtype=jnp.float32)
    got = multilevel_roi_align_pallas(
        feats, rois, bidx, pcfg, compute_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
