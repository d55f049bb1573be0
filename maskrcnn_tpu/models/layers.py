"""Functional NN primitives (NHWC, explicit param pytrees).

The whole model zoo is expressed as pure functions over nested dicts of
arrays — no module framework. Rationale: every norm in these detectors is
frozen (reference FrozenBatchNorm2d, layers/batch_norm.py:6-31), so there is
no mutable state; pure functions jit/shard/diff cleanly and give full
control over the parameter tree for Detectron weight import.

Conventions:
  * activations NHWC, conv kernels HWIO, fc weights [in, out]
  * parameters live in float32; hot paths cast to a compute dtype
    (bfloat16 by default) at use, with float32 MXU accumulation
  * a conv param dict is {"w": HWIO[, "b": [out]]}; frozen-BN is
    {"scale", "bias", "mean", "var"} ([C] each); GN is {"scale", "bias"}
"""

import math

import jax
import jax.numpy as jnp
from jax import lax

# -- initializers -------------------------------------------------------------


def kaiming_normal(key, shape, fan, a=0.0):
    """He-normal on the given fan (shape HWIO; fan computed by caller)."""
    gain = math.sqrt(2.0 / (1 + a * a))
    std = gain / math.sqrt(fan)
    return std * jax.random.normal(key, shape, jnp.float32)


def kaiming_uniform(key, shape, fan, a=1.0):
    gain = math.sqrt(2.0 / (1 + a * a))
    bound = gain * math.sqrt(3.0 / fan)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def normal_init(key, shape, std):
    return std * jax.random.normal(key, shape, jnp.float32)


def conv_fans(kh, kw, cin, cout, groups=1):
    fan_in = kh * kw * (cin // groups)
    fan_out = kh * kw * (cout // groups)
    return fan_in, fan_out


# -- param constructors ---------------------------------------------------------


def init_conv(
    key,
    kh,
    kw,
    cin,
    cout,
    bias=True,
    groups=1,
    init="msra_fill",
    std=0.01,
):
    """init: "msra_fill" (Caffe2 MSRAFill = He-normal fan_out, backbone
    default), "kaiming_uniform" (a=1, FPN), "normal" (heads), "zeros"."""
    shape = (kh, kw, cin // groups, cout)
    fan_in, fan_out = conv_fans(kh, kw, cin, cout, groups)
    if init == "msra_fill":
        w = kaiming_normal(key, shape, fan_out)
    elif init == "kaiming_uniform":
        w = kaiming_uniform(key, shape, fan_in, a=1.0)
    elif init == "kaiming_normal_fanin":  # torch kaiming_normal_ default
        w = kaiming_normal(key, shape, fan_in)
    elif init == "normal":
        w = normal_init(key, shape, std)
    elif init == "zeros":
        w = jnp.zeros(shape, jnp.float32)
    else:
        raise ValueError(init)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def init_linear(key, cin, cout, init="kaiming_uniform", std=0.01):
    if init == "kaiming_uniform":
        w = kaiming_uniform(key, (cin, cout), cin, a=1.0)
    elif init == "normal":
        w = normal_init(key, (cin, cout), std)
    elif init == "caffe2_xavier":  # XavierFill: uniform(+-sqrt(3/fan_in))
        bound = math.sqrt(3.0 / cin)
        w = jax.random.uniform(key, (cin, cout), jnp.float32, -bound, bound)
    else:
        raise ValueError(init)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def init_frozen_bn(c):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def init_group_norm(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


# -- apply functions --------------------------------------------------------------


def conv2d(x, p, stride=1, padding=0, dilation=1, groups=1, compute_dtype=jnp.bfloat16):
    """NHWC conv. padding: int (symmetric) or 'SAME'."""
    w = p["w"]
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    # No explicit preferred_element_type: XLA accumulates bf16 convs in f32
    # on the MXU already, and a f32 output here breaks the VJP dtype match.
    out = lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if "b" in p:
        out = out + p["b"].astype(compute_dtype)
    return out


def conv_transpose2d(x, p, stride=2, compute_dtype=jnp.bfloat16):
    """NHWC transposed conv with kernel size = stride (the only shape the
    mask/keypoint heads use: deconv 2x, and deconv 4x upsampling)."""
    w = p["w"]  # HWIO with I = input channels
    out = lax.conv_transpose(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # torch ConvTranspose2d(k, s, p) output: (in-1)*s - 2p + k ; for the
    # heads k=2,s=2,p=0 and k=4,s=2,p=1. VALID gives (in-1)*s + k; crop p on
    # each side to match torch.
    k = w.shape[0]
    pad = (k - stride) // 2
    if pad > 0:
        out = out[:, pad:-pad, pad:-pad, :]
    if "b" in p:
        out = out + p["b"].astype(compute_dtype)
    return out


def frozen_bn(x, p):
    """y = x * scale/sqrt(var) + (bias - mean*scale/sqrt(var)); no eps,
    matching the reference exactly (layers/batch_norm.py:27-31).

    The affine params are stop_gradient'ed: frozen BN never trains (the
    reference registers them as buffers), and without the stop the backward
    materializes per-channel reductions over every full-size activation
    only for the optimizer to zero them."""
    scale = lax.stop_gradient(p["scale"] * lax.rsqrt(p["var"]))
    bias = lax.stop_gradient(p["bias"] - p["mean"] * scale)
    return (x * scale.astype(x.dtype) + bias.astype(x.dtype)).astype(x.dtype)


def group_norm(x, p, num_groups, eps=1e-5):
    """NHWC group norm (normalizes over H, W and channels within a group)."""
    b, h, w, c = x.shape
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    return (xf * p["scale"] + p["bias"]).astype(orig_dtype)


def linear(x, p, compute_dtype=jnp.bfloat16):
    out = jnp.dot(x.astype(compute_dtype), p["w"].astype(compute_dtype))
    return out + p["b"].astype(compute_dtype)


def max_pool2d(x, window=3, stride=2, padding=1):
    """torch MaxPool2d semantics (symmetric int padding with -inf)."""
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def relu(x):
    return jnp.maximum(x, 0)


def nearest_upsample2x(x):
    """2x nearest-neighbour upsample (FPN top-down path, fpn.py:57)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def get_group_gn(dim, dim_per_gp, num_groups):
    """Number of GN groups given channels (make_layers.py:14-29)."""
    assert dim_per_gp == -1 or num_groups == -1
    if dim_per_gp > 0:
        assert dim % dim_per_gp == 0
        return dim // dim_per_gp
    assert dim % num_groups == 0
    return num_groups
