"""Feature Pyramid Network (functional, NHWC).

Reference: maskrcnn_benchmark/modeling/backbone/fpn.py:7-99. Lateral 1x1
convs + top-down 2x nearest upsampling + 3x3 output convs, with optional GN
and ReLU, plus the two extra-level blocks: LastLevelMaxPool (P6 for R-CNN)
and LastLevelP6P7 (RetinaNet).
"""

import jax
import jax.numpy as jnp

from .layers import (
    conv2d,
    group_norm,
    init_conv,
    init_group_norm,
    max_pool2d,
    nearest_upsample2x,
    relu,
)


def init_fpn(key, in_channels_list, out_channels, use_gn=False):
    params = {"inner": [], "layer": []}
    keys = jax.random.split(key, 2 * len(in_channels_list))
    for i, cin in enumerate(in_channels_list):
        if cin == 0:
            params["inner"].append(None)
            params["layer"].append(None)
            continue
        inner = {
            "conv": init_conv(
                keys[2 * i], 1, 1, cin, out_channels,
                bias=not use_gn, init="kaiming_uniform",
            )
        }
        layer = {
            "conv": init_conv(
                keys[2 * i + 1], 3, 3, out_channels, out_channels,
                bias=not use_gn, init="kaiming_uniform",
            )
        }
        if use_gn:
            inner["gn"] = init_group_norm(out_channels)
            layer["gn"] = init_group_norm(out_channels)
        params["inner"].append(inner)
        params["layer"].append(layer)
    return params


def _block(x, p, k, padding, use_gn, use_relu, gn_groups, compute_dtype):
    out = conv2d(x, p["conv"], padding=padding, compute_dtype=compute_dtype)
    if use_gn:
        out = group_norm(out, p["gn"], gn_groups)
    if use_relu:
        out = relu(out)
    return out


def apply_fpn(
    params, features, use_gn=False, use_relu=False, gn_groups=32,
    top_block=None, top_block_params=None, p6p7_use_c5=True,
    compute_dtype=jnp.bfloat16,
):
    """features: bottom-up list [C2, C3, C4, C5] (or subset). Returns the
    pyramid [P2..P5] + extra levels from top_block ("maxpool" | "p6p7")."""
    inner_ps = params["inner"]
    layer_ps = params["layer"]
    last_inner = _block(
        features[-1], inner_ps[-1], 1, 0, use_gn, False, gn_groups, compute_dtype
    )
    results = [
        _block(last_inner, layer_ps[-1], 3, 1, use_gn, use_relu, gn_groups, compute_dtype)
    ]
    for feature, inner_p, layer_p in zip(
        features[-2::-1], inner_ps[-2::-1], layer_ps[-2::-1]
    ):
        if inner_p is None:
            continue
        inner_lateral = _block(
            feature, inner_p, 1, 0, use_gn, False, gn_groups, compute_dtype
        )
        top_down = nearest_upsample2x(last_inner)
        last_inner = inner_lateral + top_down
        results.insert(
            0,
            _block(last_inner, layer_p, 3, 1, use_gn, use_relu, gn_groups, compute_dtype),
        )

    if top_block == "maxpool":
        # LastLevelMaxPool (fpn.py:77-79): stride-2 1x1 max pool of P5.
        results.append(max_pool2d(results[-1], window=1, stride=2, padding=0))
    elif top_block == "p6p7":
        p = top_block_params
        x = features[-1] if p6p7_use_c5 else results[-1]
        p6 = conv2d(x, p["p6"], stride=2, padding=1, compute_dtype=compute_dtype)
        p7 = conv2d(relu(p6), p["p7"], stride=2, padding=1, compute_dtype=compute_dtype)
        results.extend([p6, p7])
    return results


def init_p6p7(key, in_channels, out_channels):
    """LastLevelP6P7 (fpn.py:82-99): kaiming_uniform(a=1), bias 0."""
    k1, k2 = jax.random.split(key)
    return {
        "p6": init_conv(k1, 3, 3, in_channels, out_channels, init="kaiming_uniform"),
        "p7": init_conv(k2, 3, 3, out_channels, out_channels, init="kaiming_uniform"),
    }
