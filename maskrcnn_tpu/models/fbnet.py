"""FBNet mobile backbones and lightweight heads.

Reference: maskrcnn_benchmark/modeling/backbone/{fbnet.py:21-252,
fbnet_builder.py:37-829, fbnet_modeldef.py}. Ships the same five built-in
architectures (default, mobilenet_v2, cham_v1a, cham_v2, xirb16d_dsmask)
and ingests arbitrary architectures from MODEL.FBNET.ARCH_DEF JSON — both
this module's compact schema and the reference's block_op_type/block_cfg
schema (convert_reference_arch_def). The full primitive search space is
supported via the parse_op name grammar: ir_k{1,3,5,7} with expansion
override / grouped-pw channel shuffle / squeeze-excite / cascaded-dw
suffixes, plus skip, basic_block (CascadeConv3x3) and shift_5x5.

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


def parse_op(name):
    """Decode a reference primitive name into a block spec.

    The reference enumerates ~40 PRIMITIVES lambdas
    (fbnet_builder.py:37-195); every one of them is a parameterization of
    four structural templates, so a small name grammar replaces the table:

      ir_k{K}[_e{E}][_s{G}][_se][_sep]   inverted residual: kernel K,
            expansion override E, grouped-pw+channel-shuffle with G groups
            (s2 implies E=1, s4 implies E=4), squeeze-excite, cascaded
            ("sep") double depthwise. ir_k33* = kernel 3 with cdw.
      shuffle                            ir block, pw_group=4, mid shuffle
      skip                               identity (1x1 conv when shape changes)
      basic_block                        CascadeConv3x3
      shift_5x5                          ShiftBlock5x5 (constant shift conv)
    """
    if name in _KERNELS:  # internal shorthand used by the built-in tables
        name = "ir_" + name
    if name == "skip":
        return dict(kind="skip")
    if name == "basic_block":
        return dict(kind="cascade")
    if name == "shift_5x5":
        return dict(kind="shift")
    base = dict(kind="irf", kernel=3, pw_group=1, shuffle=False, se=False,
                cdw=False, exp_override=None)
    if name == "shuffle":
        base.update(pw_group=4, shuffle=True)
        return base
    if not name.startswith("ir_k"):
        raise ValueError("unknown FBNet primitive: {}".format(name))
    parts = name[3:].split("_")
    if parts[0] == "k33":
        base.update(kernel=3, cdw=True)
    else:
        base["kernel"] = int(parts[0][1:])
    for p in parts[1:]:
        if p.startswith("e"):
            base["exp_override"] = int(p[1:])
        elif p == "se":
            base["se"] = True
        elif p == "sep":
            base["cdw"] = True
        elif p == "s2":
            base.update(pw_group=2, shuffle=True, exp_override=1)
        elif p == "s4":
            base.update(pw_group=4, shuffle=True, exp_override=4)
        else:
            raise ValueError(
                "unknown FBNet primitive suffix {!r} in {!r}".format(p, name)
            )
    return base


def convert_reference_arch_def(d):
    """Reference ARCH_DEF JSON (fbnet_modeldef.py schema: block_op_type +
    block_cfg) -> this module's internal arch dict."""
    ops = d["block_op_type"]
    cfg = d["block_cfg"]
    stages = []
    for stage_ops, stage_cfg in zip(ops, cfg["stages"]):
        # ops are per expanded block; regroup them onto the [t,c,n,s] groups
        flat_ops = list(stage_ops)
        groups = []
        k = 0
        for (t, c, n, s) in stage_cfg:
            for i in range(n):
                groups.append((flat_ops[min(k, len(flat_ops) - 1)], t, c, 1,
                               s if i == 0 else 1))
                k += 1
        stages.append(groups)
    out = dict(first=list(cfg["first"]), stages=stages)
    for head in ("backbone", "rpn", "bbox", "mask"):
        if head in cfg:
            out[head] = list(cfg[head])
    if "rpn_stride" in d:
        out["rpn_stride"] = d["rpn_stride"]
    return out


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
    """Flatten [op, t, c, n, s] groups into per-block specs."""
    blocks = []
    for si in stage_indices:
        for (k, t, c, n, s) in arch["stages"][si]:
            c = _scale_channels(c, scale, divisor)
            op = parse_op(k)
            for i in range(n):
                stride = s if i == 0 else 1
                spec = dict(op)
                if spec.pop("exp_override", None) is not None:
                    t = parse_op(k)["exp_override"]
                spec.update(expansion=t, out=c, stride=stride)
                blocks.append(spec)
    return blocks


# -- IRF (MBConv) block ---------------------------------------------------------


def _se_init(key, c):
    mid = max(c // 4, 8)
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_conv(k1, 1, 1, c, mid, bias=True),
        "fc2": init_conv(k2, 1, 1, mid, c, bias=True),
    }


def _se_apply(p, x, compute_dtype):
    s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
    s = relu(conv2d(s.astype(compute_dtype), p["fc1"], padding=0,
                    compute_dtype=compute_dtype))
    s = jax.nn.sigmoid(
        conv2d(s, p["fc2"], padding=0, compute_dtype=compute_dtype)
        .astype(jnp.float32)
    )
    return x * s.astype(x.dtype)


def _channel_shuffle(x, groups):
    n, h, w, c = x.shape
    return (
        x.reshape(n, h, w, groups, c // groups)
        .swapaxes(3, 4)
        .reshape(n, h, w, c)
    )


def _shift_kernel(c, ksize=5):
    """Constant depthwise kernel realizing the Shift op: each channel group
    is displaced to one of the ksize^2 grid offsets (the center group takes
    the remainder channels). Reference fbnet_builder.py Shift."""
    import numpy as np

    k = np.zeros((ksize, ksize, 1, c), np.float32)
    ksq = ksize * ksize
    hks = ksize // 2
    ch = 0
    for i in range(ksize):
        for j in range(ksize):
            num = c // ksq + (c % ksq if (i == hks and j == hks) else 0)
            k[i, j, 0, ch:ch + num] = 1.0
            ch += num
    return jnp.asarray(k)


def init_irf_block(key, cin, spec):
    kind = spec.get("kind", "irf")
    keys = jax.random.split(key, 5)
    if kind == "skip":
        if cin == spec["out"] and spec["stride"] == 1:
            return {}
        return {
            "conv": init_conv(keys[0], 1, 1, cin, spec["out"], bias=False),
            "bn": init_frozen_bn(spec["out"]),
        }
    if kind == "cascade":
        return {
            "conv1": init_conv(keys[0], 3, 3, cin, cin, bias=False),
            "bn1": init_frozen_bn(cin),
            "conv2": init_conv(keys[1], 3, 3, cin, spec["out"], bias=False),
            "bn2": init_frozen_bn(spec["out"]),
        }
    if kind == "shift":
        mid = _divisible(int(cin * spec["expansion"]), 8)
        return {
            "pw": init_conv(keys[0], 1, 1, cin, mid, bias=False),
            "pw_bn": init_frozen_bn(mid),
            "pwl": init_conv(keys[1], 1, 1, mid, spec["out"], bias=False),
            "pwl_bn": init_frozen_bn(spec["out"]),
        }
    # inverted residual
    mid = int(cin * spec["expansion"])
    g = spec.get("pw_group", 1)
    p = {}
    if spec["expansion"] != 1 or g > 1:
        p["pw"] = init_conv(keys[0], 1, 1, cin, mid, bias=False, groups=g)
        p["pw_bn"] = init_frozen_bn(mid)
    if spec["kernel"] > 1:
        p["dw"] = init_conv(
            keys[1], spec["kernel"], spec["kernel"], mid, mid, bias=False,
            groups=mid,
        )
        p["dw_bn"] = init_frozen_bn(mid)
        if spec.get("cdw"):
            p["dw2"] = init_conv(
                keys[3], spec["kernel"], spec["kernel"], mid, mid, bias=False,
                groups=mid,
            )
            p["dw2_bn"] = init_frozen_bn(mid)
    p["pwl"] = init_conv(keys[2], 1, 1, mid, spec["out"], bias=False, groups=g)
    p["pwl_bn"] = init_frozen_bn(spec["out"])
    if spec.get("se"):
        p["se"] = _se_init(keys[4], spec["out"])
    return p


def apply_irf_block(p, x, spec, compute_dtype=jnp.bfloat16):
    kind = spec.get("kind", "irf")
    cin = x.shape[-1]
    if kind == "skip":
        if not p:
            return x
        return relu(
            frozen_bn(
                conv2d(x, p["conv"], stride=max(spec["stride"], 1), padding=0,
                       compute_dtype=compute_dtype),
                p["bn"],
            )
        )
    if kind == "cascade":
        out = relu(
            frozen_bn(
                conv2d(x, p["conv1"], stride=max(spec["stride"], 1), padding=1,
                       compute_dtype=compute_dtype),
                p["bn1"],
            )
        )
        out = frozen_bn(
            conv2d(out, p["conv2"], padding=1, compute_dtype=compute_dtype),
            p["bn2"],
        )
        if spec["stride"] == 1 and cin == spec["out"]:
            out = out + x
        return out
    if kind == "shift":
        mid = _divisible(int(cin * spec["expansion"]), 8)
        out = relu(
            frozen_bn(
                conv2d(x, p["pw"], padding=0, compute_dtype=compute_dtype),
                p["pw_bn"],
            )
        )
        shift_w = {"w": _shift_kernel(mid).astype(out.dtype)}
        out = conv2d(out, shift_w, stride=max(spec["stride"], 1), padding=2,
                     groups=mid, compute_dtype=compute_dtype)
        out = frozen_bn(
            conv2d(out, p["pwl"], padding=0, compute_dtype=compute_dtype),
            p["pwl_bn"],
        )
        if spec["stride"] == 1 and cin == spec["out"]:
            out = out + x
        return out

    mid = int(cin * spec["expansion"])
    g = spec.get("pw_group", 1)
    out = x
    if "pw" in p:
        out = relu(
            frozen_bn(
                conv2d(out, p["pw"], padding=0, groups=g,
                       compute_dtype=compute_dtype),
                p["pw_bn"],
            )
        )
    if spec.get("shuffle") and g > 1:
        out = _channel_shuffle(out, g)
    stride = spec["stride"]
    if stride == -2:
        out = nearest_upsample2x(out)
        stride = 1
    k = spec["kernel"]
    if "dw" in p:
        out = relu(
            frozen_bn(
                conv2d(out, p["dw"], stride=stride, padding=k // 2, groups=mid,
                       compute_dtype=compute_dtype),
                p["dw_bn"],
            )
        )
        if "dw2" in p:
            out = relu(
                frozen_bn(
                    conv2d(out, p["dw2"], stride=1, padding=k // 2, groups=mid,
                           compute_dtype=compute_dtype),
                    p["dw2_bn"],
                )
            )
    out = frozen_bn(
        conv2d(out, p["pwl"], padding=0, groups=g, compute_dtype=compute_dtype),
        p["pwl_bn"],
    )
    if spec["stride"] == 1 and cin == spec["out"]:
        out = out + x
    if "se" in p:
        out = _se_apply(p["se"], out, compute_dtype)
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
            if "block_cfg" in arch:
                # the reference fbnet_modeldef.py JSON schema
                # (fbnet.py:27-41 json.loads of FBNET.ARCH_DEF)
                arch = convert_reference_arch_def(arch)
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
