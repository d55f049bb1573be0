"""FBNet mobile backbones and lightweight heads.

Reference: maskrcnn_benchmark/modeling/backbone/{fbnet.py:21-252,
fbnet_builder.py:37-829, fbnet_modeldef.py}. Capability scope: the
architectures the reference actually ships detection baselines for
(default, mobilenet_v2, cham_v1a, cham_v2, xirb16d_dsmask), which are all
composed of inverted-residual (MBConv) blocks ir_k{3,5,7} plus the first
conv — the exotic search-space primitives (shift/shuffle/SE/cascade) are
not used by any shipped model and are omitted.

Arch defs are data: stages of [t (expansion), c (channels), n (repeats),
s (stride; -2 = 2x nearest upsample)], with stage-index groups for
backbone / rpn / bbox / mask heads. Batch norm runs with frozen statistics
(the detection fine-tune regime); SCALE_FACTOR / WIDTH_DIVISOR apply as in
the reference builder.
"""

import jax
import jax.numpy as jnp

from .layers import (
    conv2d,
    frozen_bn,
    init_conv,
    init_frozen_bn,
    nearest_upsample2x,
    relu,
)

# [t, c, n, s] per block group; op kernel size per stage from block_op_type
MODEL_ARCH = {
    "default": dict(
        first=[32, 2],
        stages=[
            [("k3", 1, 16, 1, 1)],
            [("k3", 6, 24, 2, 2)],
            [("k3", 6, 32, 3, 2)],
            [("k3", 6, 64, 4, 2), ("k3", 6, 96, 3, 1)],
            [("k3", 4, 160, 1, 2), ("k3", 6, 160, 2, 1), ("k3", 6, 240, 1, 1)],
            [("k3", 6, 96, 3, 1)],
            [("k3", 4, 160, 1, 1), ("k3", 6, 160, 3, 1), ("k3", 3, 80, 1, -2)],
        ],
        backbone=[0, 1, 2, 3], rpn=[5], bbox=[4], mask=[6],
    ),
    "mobilenet_v2": dict(
        first=[32, 2],
        stages=[
            [("k3", 1, 16, 1, 1)],
            [("k3", 6, 24, 2, 2)],
            [("k3", 6, 32, 3, 2)],
            [("k3", 6, 64, 4, 2), ("k3", 6, 96, 3, 1)],
            [("k3", 6, 160, 3, 1), ("k3", 6, 320, 1, 1)],
        ],
        backbone=[0, 1, 2, 3], rpn=[], bbox=[4], mask=[],
    ),
    "cham_v1a": dict(
        first=[32, 2],
        stages=[
            [("k3", 1, 24, 1, 1)],
            [("k7", 4, 48, 2, 2)],
            [("k3", 7, 64, 5, 2)],
            [("k5", 12, 56, 7, 2), ("k3", 8, 88, 5, 1)],
            [("k3", 7, 152, 4, 2), ("k3", 10, 104, 1, 1)],
            [("k3", 8, 88, 3, 1)],
        ],
        backbone=[0, 1, 2, 3], rpn=[5], bbox=[4], mask=[],
    ),
    "cham_v2": dict(
        first=[32, 2],
        stages=[
            [("k3", 1, 24, 1, 1)],
            [("k5", 8, 32, 4, 2)],
            [("k7", 5, 48, 6, 2)],
            [("k5", 9, 56, 3, 2), ("k3", 6, 56, 6, 1)],
            [("k3", 2, 160, 6, 2), ("k3", 6, 112, 1, 1)],
            [("k3", 6, 56, 1, 1)],
        ],
        backbone=[0, 1, 2, 3], rpn=[5], bbox=[4], mask=[],
    ),
    "xirb16d_dsmask": dict(
        first=[16, 2],
        stages=[
            [("k3", 1, 16, 1, 1)],
            [("k3", 6, 32, 2, 2)],
            [("k3", 6, 48, 3, 2)],
            [("k3", 6, 96, 4, 2), ("k3", 6, 128, 3, 1)],
            [("k3", 4, 128, 1, 2), ("k3", 6, 128, 2, 1), ("k3", 6, 160, 1, 1)],
            [("k3", 4, 128, 1, 2), ("k3", 6, 128, 2, 1), ("k3", 6, 128, 1, -2),
             ("k3", 3, 64, 1, -2)],
            [("k3", 6, 128, 3, 1)],
        ],
        backbone=[0, 1, 2, 3], rpn=[6], bbox=[4], mask=[5],
    ),
}

_KERNELS = {"k3": 3, "k5": 5, "k7": 7}


def _py2_round(x):
    import decimal

    return int(
        decimal.Decimal(x).quantize(decimal.Decimal(1), rounding=decimal.ROUND_HALF_EVEN)
    )


def _divisible(num, divisor):
    if divisor <= 1:
        return int(num)
    ret = max(divisor, int(num + divisor / 2) // divisor * divisor)
    return ret


def _scale_channels(c, scale, divisor):
    if scale == 1.0:
        return int(c)
    return _divisible(_py2_round(c * scale), divisor)


def expand_blocks(arch, stage_indices, scale=1.0, divisor=1):
    """Flatten [kernel, t, c, n, s] groups into per-block specs."""
    blocks = []
    for si in stage_indices:
        for (k, t, c, n, s) in arch["stages"][si]:
            c = _scale_channels(c, scale, divisor)
            for i in range(n):
                stride = s if i == 0 else 1
                blocks.append(dict(kernel=_KERNELS[k], expansion=t, out=c,
                                   stride=stride))
    return blocks


# -- IRF (MBConv) block ---------------------------------------------------------


def init_irf_block(key, cin, spec):
    keys = jax.random.split(key, 3)
    mid = int(cin * spec["expansion"])
    p = {}
    if spec["expansion"] != 1:
        p["pw"] = init_conv(keys[0], 1, 1, cin, mid, bias=False)
        p["pw_bn"] = init_frozen_bn(mid)
    p["dw"] = init_conv(
        keys[1], spec["kernel"], spec["kernel"], mid, mid, bias=False, groups=mid
    )
    p["dw_bn"] = init_frozen_bn(mid)
    p["pwl"] = init_conv(keys[2], 1, 1, mid, spec["out"], bias=False)
    p["pwl_bn"] = init_frozen_bn(spec["out"])
    return p


def apply_irf_block(p, x, spec, compute_dtype=jnp.bfloat16):
    cin = x.shape[-1]
    mid = int(cin * spec["expansion"])
    out = x
    if "pw" in p:
        out = relu(frozen_bn(conv2d(out, p["pw"], padding=0, compute_dtype=compute_dtype), p["pw_bn"]))
    stride = spec["stride"]
    if stride == -2:
        out = nearest_upsample2x(out)
        stride = 1
    k = spec["kernel"]
    out = relu(
        frozen_bn(
            conv2d(out, p["dw"], stride=stride, padding=k // 2, groups=mid,
                   compute_dtype=compute_dtype),
            p["dw_bn"],
        )
    )
    out = frozen_bn(conv2d(out, p["pwl"], padding=0, compute_dtype=compute_dtype), p["pwl_bn"])
    if spec["stride"] == 1 and cin == spec["out"]:
        out = out + x
    return out


def init_block_seq(key, cin, blocks):
    params = []
    keys = jax.random.split(key, max(len(blocks), 1))
    for i, spec in enumerate(blocks):
        params.append(init_irf_block(keys[i], cin, spec))
        cin = spec["out"]
    return params, cin


def apply_block_seq(params, x, blocks, compute_dtype=jnp.bfloat16):
    for p, spec in zip(params, blocks):
        x = apply_irf_block(p, x, spec, compute_dtype)
    return x


# -- backbone/head builders ----------------------------------------------------------


class FBNetPlan:
    """Static plan for one cfg: trunk + per-head block lists and channels."""

    def __init__(self, cfg):
        arch_name = cfg.MODEL.FBNET.ARCH
        if cfg.MODEL.FBNET.ARCH_DEF:
            import json

            arch = json.loads(cfg.MODEL.FBNET.ARCH_DEF)
        else:
            arch = MODEL_ARCH[arch_name]
        self.arch = arch
        scale = cfg.MODEL.FBNET.SCALE_FACTOR
        divisor = cfg.MODEL.FBNET.WIDTH_DIVISOR
        self.first_out = _scale_channels(arch["first"][0], scale, divisor)
        self.first_stride = arch["first"][1]
        self.trunk_blocks = expand_blocks(arch, arch["backbone"], scale, divisor)
        self.trunk_out = self.trunk_blocks[-1]["out"]
        self.rpn_blocks = expand_blocks(arch, arch.get("rpn", []), scale, divisor)
        self.bbox_blocks = expand_blocks(arch, arch.get("bbox", []), scale, divisor)
        self.mask_blocks = expand_blocks(arch, arch.get("mask", []), scale, divisor)


def build_fbnet_backbone(cfg):
    from .backbone import BackboneDef

    plan = FBNetPlan(cfg)

    def init(key):
        k1, k2 = jax.random.split(key)
        first = {
            "conv": init_conv(k1, 3, 3, 3, plan.first_out, bias=False),
            "bn": init_frozen_bn(plan.first_out),
        }
        trunk, _ = init_block_seq(k2, plan.first_out, plan.trunk_blocks)
        return {"body": {"first": first, "trunk": trunk}}

    def apply(params, x, compute_dtype=jnp.bfloat16):
        body = params["body"]
        x = relu(
            frozen_bn(
                conv2d(x, body["first"]["conv"], stride=plan.first_stride,
                       padding=1, compute_dtype=compute_dtype),
                body["first"]["bn"],
            )
        )
        x = apply_block_seq(body["trunk"], x, plan.trunk_blocks, compute_dtype)
        return [x]

    def frozen_mask(params):
        # freeze nothing structurally; BN stats are buffers
        from .resnet import _bn_only_mask

        return {"body": _bn_only_mask(params["body"])}

    # overall stride: first(2) * stage strides in backbone
    stride = plan.first_stride
    for b in plan.trunk_blocks:
        if b["stride"] == 2:
            stride *= 2
    return BackboneDef(init, apply, frozen_mask, plan.trunk_out, [stride])


def init_fbnet_rpn_head(key, cfg, in_channels, num_anchors):
    plan = FBNetPlan(cfg)
    blocks = plan.rpn_blocks
    k1, k2, k3 = jax.random.split(key, 3)
    tower, cout = init_block_seq(k1, in_channels, blocks)
    return {
        "tower": tower,
        "cls_logits": init_conv(k2, 1, 1, cout, num_anchors, init="normal", std=0.01),
        "bbox_pred": init_conv(k3, 1, 1, cout, num_anchors * 4, init="normal", std=0.01),
    }


def apply_fbnet_rpn_head(params, cfg, features, compute_dtype=jnp.bfloat16):
    plan = FBNetPlan(cfg)
    objectness, bbox_reg = [], []
    for f in features:
        t = apply_block_seq(params["tower"], f, plan.rpn_blocks, compute_dtype)
        objectness.append(conv2d(t, params["cls_logits"], padding=0, compute_dtype=compute_dtype))
        bbox_reg.append(conv2d(t, params["bbox_pred"], padding=0, compute_dtype=compute_dtype))
    return objectness, bbox_reg


def init_fbnet_head(key, cfg, in_channels, which="bbox"):
    plan = FBNetPlan(cfg)
    blocks = {"bbox": plan.bbox_blocks, "mask": plan.mask_blocks}[which]
    params, cout = init_block_seq(key, in_channels, blocks)
    return {"blocks": params}, cout


def apply_fbnet_head(params, cfg, x, which="bbox", compute_dtype=jnp.bfloat16):
    plan = FBNetPlan(cfg)
    blocks = {"bbox": plan.bbox_blocks, "mask": plan.mask_blocks}[which]
    return apply_block_seq(params["blocks"], x, blocks, compute_dtype)
