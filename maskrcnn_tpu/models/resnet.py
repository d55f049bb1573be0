"""ResNet / ResNeXt backbone (functional, NHWC, frozen BN).

Capability parity with the reference backbone (reference:
maskrcnn_benchmark/modeling/backbone/resnet.py:46-451): stage specs for
R-50/101/152 in C4/C5/FPN variants, ResNeXt grouped convs, stride_in_1x1,
dilation in res5, freeze-at semantics, GN variants, and the detached res5
head used by C4 ROI heads (ResNetHead).

Differences by design:
  * functional params + explicit `frozen` mask instead of requires_grad
  * freezing applies stop_gradient to the stage's params at apply time AND
    excludes them from the optimizer via the mask (solver/build.py)
  * all convs run in the compute dtype (bf16) with fp32 accumulation
"""

from collections import namedtuple

import jax
import jax.numpy as jnp
from jax import lax

from .layers import conv2d, frozen_bn, group_norm, init_conv, init_frozen_bn, init_group_norm, max_pool2d, relu

StageSpec = namedtuple("StageSpec", ["index", "block_count", "return_features"])


def _spec(counts, returns):
    return tuple(
        StageSpec(index=i + 1, block_count=c, return_features=r)
        for i, (c, r) in enumerate(zip(counts, returns))
    )


# Stage tables (reference resnet.py:46-79).
STAGE_SPECS = {
    "R-50-C4": _spec((3, 4, 6), (False, False, True)),
    "R-50-C5": _spec((3, 4, 6, 3), (False, False, False, True)),
    "R-101-C4": _spec((3, 4, 23), (False, False, True)),
    "R-101-C5": _spec((3, 4, 23, 3), (False, False, False, True)),
    "R-50-FPN": _spec((3, 4, 6, 3), (True, True, True, True)),
    "R-50-FPN-RETINANET": _spec((3, 4, 6, 3), (True, True, True, True)),
    "R-101-FPN": _spec((3, 4, 23, 3), (True, True, True, True)),
    "R-101-FPN-RETINANET": _spec((3, 4, 23, 3), (True, True, True, True)),
    "R-152-FPN": _spec((3, 8, 36, 3), (True, True, True, True)),
}


def _norm_kind(cfg):
    return "gn" if cfg.MODEL.RESNETS.TRANS_FUNC == "BottleneckWithGN" else "bn"


def _init_norm(c, kind):
    return init_group_norm(c) if kind == "gn" else init_frozen_bn(c)


def _apply_norm(x, p, kind, gn_groups=32):
    if kind == "gn":
        return group_norm(x, p, gn_groups)
    return frozen_bn(x, p)


def conv_norm(x, pc, pn, kind, gn_groups, stride=1, padding=0, dilation=1,
              groups=1, compute_dtype=jnp.bfloat16):
    """conv followed by the stage norm; for frozen BN the affine is folded
    into the conv weights (y = conv(x, w*s) + t with s = scale*rsqrt(var),
    t = bias - mean*s — identical algebra to reference FrozenBatchNorm2d,
    layers/batch_norm.py:27-31). Folding removes a full-activation
    elementwise pass per conv from both the forward epilogue and the
    backward (the bn cotangent g*s), and lets XLA fuse relu/residual adds
    straight onto the conv output."""
    if kind != "bn":
        return _apply_norm(
            conv2d(x, pc, stride=stride, padding=padding, dilation=dilation,
                   groups=groups, compute_dtype=compute_dtype),
            pn, kind, gn_groups,
        )
    s = lax.stop_gradient(pn["scale"] * lax.rsqrt(pn["var"]))
    t = lax.stop_gradient(pn["bias"] - pn["mean"] * s)
    folded = {"w": pc["w"] * s, "b": t}
    return conv2d(x, folded, stride=stride, padding=padding,
                  dilation=dilation, groups=groups,
                  compute_dtype=compute_dtype)


def init_bottleneck(key, cin, bottleneck_channels, cout, num_groups, norm_kind,
                    dcn=None):
    keys = jax.random.split(key, 5)
    p = {
        "conv1": init_conv(keys[0], 1, 1, cin, bottleneck_channels, bias=False),
        "bn1": _init_norm(bottleneck_channels, norm_kind),
        "conv2": init_conv(
            keys[1], 3, 3, bottleneck_channels, bottleneck_channels,
            bias=False, groups=num_groups,
        ),
        "bn2": _init_norm(bottleneck_channels, norm_kind),
        "conv3": init_conv(keys[2], 1, 1, bottleneck_channels, cout, bias=False),
        "bn3": _init_norm(cout, norm_kind),
    }
    if dcn is not None:
        # DFConv2d (reference layers/misc.py:110-203): a regular conv
        # predicting per-tap offsets (+ modulation mask for v2),
        # zero-initialized so training starts as a plain conv.
        g = dcn["deformable_groups"]
        off_ch = (27 if dcn["modulated"] else 18) * g
        p["conv2_offset"] = init_conv(
            keys[4], 3, 3, bottleneck_channels, off_ch, bias=True, init="zeros"
        )
    if cin != cout:
        p["downsample"] = {
            "conv": init_conv(keys[3], 1, 1, cin, cout, bias=False),
            "bn": _init_norm(cout, norm_kind),
        }
    return p


def apply_bottleneck(
    p, x, stride, dilation, num_groups, stride_in_1x1, norm_kind, gn_groups,
    compute_dtype, dcn=None,
):
    s1, s2 = (stride, 1) if stride_in_1x1 else (1, stride)
    out = relu(conv_norm(x, p["conv1"], p["bn1"], norm_kind, gn_groups,
                         stride=s1, padding=0, compute_dtype=compute_dtype))
    if dcn is not None and "conv2_offset" in p:
        from ..ops.deform_conv import deform_conv2d

        g = dcn["deformable_groups"]
        off = conv2d(
            out, p["conv2_offset"], stride=s2, padding=dilation,
            dilation=dilation, compute_dtype=jnp.float32,
        ).astype(jnp.float32)
        if dcn["modulated"]:
            k2 = 9
            offsets = off[..., : 2 * k2 * g]
            mask = jax.nn.sigmoid(off[..., 2 * k2 * g:])
        else:
            offsets, mask = off, None
        out = deform_conv2d(
            out, offsets, p["conv2"]["w"], mask=mask, stride=s2,
            padding=dilation, dilation=dilation, groups=num_groups,
            deformable_groups=g, compute_dtype=compute_dtype,
        ).astype(compute_dtype)
        out = _apply_norm(out, p["bn2"], norm_kind, gn_groups)
    else:
        out = conv_norm(
            out, p["conv2"], p["bn2"], norm_kind, gn_groups, stride=s2,
            padding=dilation, dilation=dilation, groups=num_groups,
            compute_dtype=compute_dtype,
        )
    out = relu(out)
    out = conv_norm(out, p["conv3"], p["bn3"], norm_kind, gn_groups,
                    padding=0, compute_dtype=compute_dtype)
    if "downsample" in p:
        identity = conv_norm(
            x, p["downsample"]["conv"], p["downsample"]["bn"], norm_kind,
            gn_groups, stride=stride, padding=0, compute_dtype=compute_dtype,
        )
    else:
        identity = x
    return relu(out + identity)


def init_stage(key, cin, bottleneck_channels, cout, block_count, num_groups,
               norm_kind, dcn=None):
    keys = jax.random.split(key, block_count)
    blocks = []
    for i in range(block_count):
        blocks.append(
            init_bottleneck(
                keys[i], cin if i == 0 else cout, bottleneck_channels, cout,
                num_groups, norm_kind, dcn=dcn,
            )
        )
    return blocks


def apply_stage(
    blocks, x, first_stride, dilation, num_groups, stride_in_1x1, norm_kind,
    gn_groups, compute_dtype, dcn=None, remat=False,
):
    for i, bp in enumerate(blocks):
        stride = first_stride if i == 0 else 1

        def block_fn(bp_, x_, _stride=stride):
            return apply_bottleneck(
                bp_, x_, _stride, dilation, num_groups, stride_in_1x1,
                norm_kind, gn_groups, compute_dtype, dcn=dcn,
            )

        if remat:
            # Per-block rematerialization: the backward pass recomputes the
            # three conv+norm intermediates from the block input instead of
            # keeping them live. Matters for deep/grouped backbones
            # (R-101, X-101-32x8d) where XLA's groups-to-batch layout for
            # grouped convs pads bf16[B,H,W,G,Cg] tiles up to 4x — batch-8
            # X-101 training otherwise exceeds 16G HBM.
            block_fn = jax.checkpoint(block_fn)
        x = block_fn(bp, x)
    return x


def init_stem(key, cout, norm_kind):
    return {
        "conv1": init_conv(key, 7, 7, 3, cout, bias=False),
        "bn1": _init_norm(cout, norm_kind),
    }


def _stem_conv_s2d(x, p, compute_dtype):
    """The 7x7/stride-2/pad-3 stem conv as a space-to-depth(2) + 4x4/stride-1
    conv. The direct form runs at ~3% MXU utilization on TPU (3 input
    channels occupy 3/128 lanes and the strided 7x7 window defeats the conv
    tiler); regrouping 2x2 pixel blocks into 12 channels and scattering the
    49 taps into a 4x4 kernel over blocks is mathematically identical
    (same taps, same zero padding) and measures ~5x faster. Mirrors the
    classic detectron2/XLA stem space-to-depth optimization; numerics differ
    from the direct conv only by bf16 summation order.
    """
    w7 = p["w"]  # [7, 7, 3, 64]
    cin, cout = w7.shape[2], w7.shape[3]
    # w8[m, n, dy, dx, c, o] = w7[2m+dy-1, 2n+dx-1, c, o] (zero outside)
    wp = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))  # [8, 8, cin, cout]
    w8 = (
        wp.reshape(4, 2, 4, 2, cin, cout)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(4, 4, 4 * cin, cout)
    )
    b, h, w, _ = x.shape
    # The 2x2-block regroup is NOT a 6D transpose: in the row-major
    # [W*cin]-flattened view, an even input row reshaped to [W/2, 2*cin]
    # IS the (dy=0, dx, c) half of the block channels and the odd row the
    # (dy=1) half, so space-to-depth reduces to two strided row slices +
    # a lane concat. XLA fuses the cast+slice+concat into one pass over
    # the image (~0.5 ms) where the general transpose lowered to three
    # full-image copies at 3/128 lane occupancy (~4.5 ms/step at batch 8).
    x = x.astype(compute_dtype)
    xr = x.reshape(b, h, w * cin)
    even = xr[:, 0::2, :].reshape(b, h // 2, w // 2, 2 * cin)
    odd = xr[:, 1::2, :].reshape(b, h // 2, w // 2, 2 * cin)
    x2 = jnp.concatenate([even, odd], axis=-1)  # [b, h/2, w/2, 4*cin]
    # out[p] needs x[2p-3 .. 2p+3] = blocks p-2 .. p+1; the (2, 1) block
    # padding (handled by the conv itself — no explicit jnp.pad copy of
    # the image) covers exactly those taps AND makes the output exactly
    # [h/2, w/2], so no trailing slice: padded position m reads blocks
    # m-2..m+1, i.e. pixels 2m+t-3 for w7 tap t in 0..6, the
    # 7x7/stride-2/pad-3 window
    out = lax.conv_general_dilated(
        x2,
        w8.astype(compute_dtype),
        window_strides=(1, 1),
        padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out


def apply_stem(p, x, norm_kind, gn_groups, compute_dtype):
    c = p["conv1"]
    bias = None
    if norm_kind == "bn" and "b" not in c:
        # fold the frozen-BN affine into the stem conv (see conv_norm)
        bn = p["bn1"]
        s = lax.stop_gradient(bn["scale"] * lax.rsqrt(bn["var"]))
        bias = lax.stop_gradient(bn["bias"] - bn["mean"] * s)
        c = {"w": c["w"] * s}
    if (
        c["w"].shape[:2] == (7, 7)
        and x.shape[1] % 2 == 0
        and x.shape[2] % 2 == 0
        and "b" not in c
    ):
        x = _stem_conv_s2d(x, c, compute_dtype)
    else:
        x = conv2d(x, c, stride=2, padding=3, compute_dtype=compute_dtype)
    if bias is not None:
        x = relu(x + bias.astype(x.dtype))
    else:
        x = relu(_apply_norm(x, p["bn1"], norm_kind, gn_groups))
    return max_pool2d(x, window=3, stride=2, padding=1)


class ResNetConfig:
    """Static plan derived from cfg (channel math: resnet.py:96-127)."""

    def __init__(self, cfg, conv_body=None):
        body = conv_body or cfg.MODEL.BACKBONE.CONV_BODY
        self.stage_specs = STAGE_SPECS[body]
        self.num_groups = cfg.MODEL.RESNETS.NUM_GROUPS
        width_per_group = cfg.MODEL.RESNETS.WIDTH_PER_GROUP
        self.stride_in_1x1 = cfg.MODEL.RESNETS.STRIDE_IN_1X1
        self.stem_out = cfg.MODEL.RESNETS.STEM_OUT_CHANNELS
        stage2_out = cfg.MODEL.RESNETS.RES2_OUT_CHANNELS
        stage2_bottleneck = self.num_groups * width_per_group
        self.res5_dilation = cfg.MODEL.RESNETS.RES5_DILATION
        self.norm_kind = _norm_kind(cfg)
        self.gn_groups = cfg.MODEL.GROUP_NORM.NUM_GROUPS
        self.freeze_at = cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT

        remat = getattr(cfg.TPU, "REMAT_BACKBONE", "auto")
        if remat == "auto":
            # R-50-sized plain backbones fit batch-8 activations without
            # remat; deeper (R-101+) or grouped (ResNeXt) ones don't.
            total_blocks = sum(s.block_count for s in self.stage_specs)
            self.remat = total_blocks > 16 or self.num_groups > 1
        else:
            self.remat = remat in (True, "all", "on")

        stage_with_dcn = tuple(cfg.MODEL.RESNETS.STAGE_WITH_DCN)
        dcn_cfg = dict(
            modulated=cfg.MODEL.RESNETS.WITH_MODULATED_DCN,
            deformable_groups=cfg.MODEL.RESNETS.DEFORMABLE_GROUPS,
        )
        self.stages = []
        for spec in self.stage_specs:
            i = spec.index
            self.stages.append(
                dict(
                    name="layer{}".format(i),
                    block_count=spec.block_count,
                    bottleneck=stage2_bottleneck * 2 ** (i - 1),
                    out=stage2_out * 2 ** (i - 1),
                    in_channels=self.stem_out if i == 1 else stage2_out * 2 ** (i - 2),
                    first_stride=1 if i == 1 else 2,
                    dilation=self.res5_dilation if i == 4 else 1,
                    return_features=spec.return_features,
                    dcn=dcn_cfg if (
                        i - 1 < len(stage_with_dcn) and stage_with_dcn[i - 1]
                    ) else None,
                )
            )
        self.out_channels = [s["out"] for s in self.stages if s["return_features"]]


def init_resnet(key, rcfg):
    keys = jax.random.split(key, len(rcfg.stages) + 1)
    params = {"stem": init_stem(keys[0], rcfg.stem_out, rcfg.norm_kind)}
    for i, st in enumerate(rcfg.stages):
        params[st["name"]] = init_stage(
            keys[i + 1], st["in_channels"], st["bottleneck"], st["out"],
            st["block_count"], rcfg.num_groups, rcfg.norm_kind,
            dcn=st.get("dcn"),
        )
    return params


def apply_resnet(params, x, rcfg, compute_dtype=jnp.bfloat16):
    """Returns the list of feature maps for return_features stages."""
    stem_p = params["stem"]
    if rcfg.freeze_at >= 1:
        stem_p = jax.tree.map(lax.stop_gradient, stem_p)
    with jax.named_scope("stem"):
        x = apply_stem(stem_p, x, rcfg.norm_kind, rcfg.gn_groups, compute_dtype)
    outputs = []
    for idx, st in enumerate(rcfg.stages):
        sp = params[st["name"]]
        # reference freeze semantics (resnet.py:134-143): stage i is frozen
        # when freeze_at >= i + 1 (stage index 1 frozen at freeze_at=2).
        if rcfg.freeze_at >= idx + 2:
            sp = jax.tree.map(lax.stop_gradient, sp)
        with jax.named_scope(st["name"]):
            x = apply_stage(
                sp, x, st["first_stride"], st["dilation"], rcfg.num_groups,
                rcfg.stride_in_1x1, rcfg.norm_kind, rcfg.gn_groups,
                compute_dtype, dcn=st.get("dcn"),
                remat=rcfg.remat and rcfg.freeze_at < idx + 2,
            )
        if st["return_features"]:
            outputs.append(x)
    return outputs


def frozen_mask_resnet(params, rcfg):
    """Pytree of bools: True where the optimizer must NOT update (frozen
    stages and all BN statistics/affine — buffers in the reference)."""

    def all_true(tree):
        return jax.tree.map(lambda _: True, tree)

    mask = {}
    mask["stem"] = (
        all_true(params["stem"])
        if rcfg.freeze_at >= 1
        else _bn_only_mask(params["stem"])
    )
    for idx, st in enumerate(rcfg.stages):
        sp = params[st["name"]]
        mask[st["name"]] = (
            all_true(sp) if rcfg.freeze_at >= idx + 2 else _bn_only_mask(sp)
        )
    return mask


def _bn_only_mask(tree):
    """True for frozen-BN leaves (scale/bias/mean/var are buffers)."""

    def rec(node):
        if isinstance(node, dict):
            if set(node.keys()) == {"scale", "bias", "mean", "var"}:
                return {k: True for k in node}
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, list):
            return [rec(v) for v in node]
        return False

    return rec(tree)


# -- detached res5 head for C4 ROI heads (reference ResNetHead, resnet.py:155-204)


def make_res5_head_config(cfg):
    num_groups = cfg.MODEL.RESNETS.NUM_GROUPS
    width_per_group = cfg.MODEL.RESNETS.WIDTH_PER_GROUP
    stage2_bottleneck = num_groups * width_per_group
    stage2_out = cfg.MODEL.RESNETS.RES2_OUT_CHANNELS
    return dict(
        block_count=3,
        in_channels=stage2_out * 4,  # 1024 for R-50
        bottleneck=stage2_bottleneck * 8,
        out=stage2_out * 8,  # 2048
        num_groups=num_groups,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        dilation=cfg.MODEL.ROI_BOX_HEAD.DILATION,
        norm_kind=_norm_kind(cfg),
        gn_groups=cfg.MODEL.GROUP_NORM.NUM_GROUPS,
    )


def init_res5_head(key, hc):
    return {
        "layer4": init_stage(
            key, hc["in_channels"], hc["bottleneck"], hc["out"],
            hc["block_count"], hc["num_groups"], hc["norm_kind"],
        )
    }


def apply_res5_head(params, x, hc, compute_dtype=jnp.bfloat16):
    return apply_stage(
        params["layer4"], x, 2 if hc["dilation"] == 1 else 1, hc["dilation"],
        hc["num_groups"], hc["stride_in_1x1"], hc["norm_kind"], hc["gn_groups"],
        compute_dtype,
    )
