import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maskrcnn_tpu.models.layers import conv2d, init_conv
from maskrcnn_tpu.ops.deform_conv import deform_conv2d, deform_psroi_pool


def test_zero_offsets_match_regular_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 12, 14, 6), jnp.float32)
    p = init_conv(jax.random.PRNGKey(0), 3, 3, 6, 8, bias=False)
    ref = conv2d(x, p, stride=1, padding=1, compute_dtype=jnp.float32)
    offsets = jnp.zeros((1, 12, 14, 18))
    out = deform_conv2d(x, offsets, p["w"], stride=1, padding=1,
                        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_zero_offsets_stride2_dilation2():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 4), jnp.float32)
    p = init_conv(jax.random.PRNGKey(1), 3, 3, 4, 4, bias=False)
    for stride, dilation in [(2, 1), (1, 2)]:
        ref = conv2d(x, p, stride=stride, padding=dilation, dilation=dilation,
                     compute_dtype=jnp.float32)
        oh, ow = ref.shape[1:3]
        offsets = jnp.zeros((2, oh, ow, 18))
        out = deform_conv2d(x, offsets, p["w"], stride=stride,
                            padding=dilation, dilation=dilation,
                            compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_modulated_mask_scales_output():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    p = init_conv(jax.random.PRNGKey(2), 3, 3, 4, 4, bias=False)
    offsets = jnp.zeros((1, 8, 8, 18))
    full = deform_conv2d(x, offsets, p["w"], mask=jnp.ones((1, 8, 8, 9)),
                         padding=1, compute_dtype=jnp.float32)
    half = deform_conv2d(x, offsets, p["w"], mask=0.5 * jnp.ones((1, 8, 8, 9)),
                         padding=1, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(half), 0.5 * np.asarray(full), atol=1e-4)


def test_integer_offset_equals_shifted_conv():
    """Offsetting every tap by exactly (0, 1) equals convolving the
    x-shifted image."""
    rng = np.random.RandomState(3)
    x = np.zeros((1, 10, 10, 2), np.float32)
    x[:, 2:8, 2:8] = rng.randn(6, 6, 2)
    xj = jnp.asarray(x)
    p = init_conv(jax.random.PRNGKey(3), 3, 3, 2, 3, bias=False)
    offsets = jnp.zeros((1, 10, 10, 18)).at[..., 1::2].set(1.0)  # dx = 1
    out = deform_conv2d(xj, offsets, p["w"], padding=1, compute_dtype=jnp.float32)
    shifted = jnp.asarray(np.roll(x, -1, axis=2))
    ref = conv2d(shifted, p, padding=1, compute_dtype=jnp.float32)
    # interior agrees (borders differ due to roll wraparound)
    np.testing.assert_allclose(
        np.asarray(out)[:, 2:8, 2:7], np.asarray(ref)[:, 2:8, 2:7], atol=1e-4
    )


def test_deform_conv_grads():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    p = init_conv(jax.random.PRNGKey(4), 3, 3, 4, 4, bias=False)
    offsets = jnp.asarray(rng.randn(1, 8, 8, 18) * 0.1, jnp.float32)

    def f(x, w, off):
        return deform_conv2d(x, off, w, padding=1, compute_dtype=jnp.float32).sum()

    gx, gw, go = jax.grad(f, argnums=(0, 1, 2))(x, p["w"], offsets)
    for g in (gx, gw, go):
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


@pytest.mark.heavy
def test_dcn_resnet_builds():
    from maskrcnn_tpu.config import cfg
    from maskrcnn_tpu.models.backbone import build_backbone

    c = cfg.clone()
    c.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    c.MODEL.RESNETS.STAGE_WITH_DCN = (False, True, True, True)
    c.MODEL.RESNETS.WITH_MODULATED_DCN = True
    bb = build_backbone(c)
    params = bb.init(jax.random.PRNGKey(0))
    assert "conv2_offset" in params["body"]["layer2"][0]
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    outs = bb.apply(params, x, compute_dtype=jnp.float32)
    assert len(outs) == 5
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_deform_psroi_pool_runs():
    rng = np.random.RandomState(5)
    feat = jnp.asarray(rng.randn(1, 16, 16, 8), jnp.float32)
    rois = jnp.asarray([[4.0, 4.0, 40.0, 40.0]])
    out = deform_psroi_pool(feat, rois, jnp.zeros(1, jnp.int32), None, 0.25, 7)
    assert out.shape == (1, 7, 7, 8)
    offs = jnp.asarray(rng.randn(1, 7, 7, 2) * 0.1, jnp.float32)
    out2 = deform_psroi_pool(feat, rois, jnp.zeros(1, jnp.int32), offs, 0.25, 7)
    assert out2.shape == (1, 7, 7, 8)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
