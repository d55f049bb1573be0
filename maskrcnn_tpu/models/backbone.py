"""Backbone builders: ResNet C4/C5, ResNet+FPN, ResNet+FPN-RetinaNet.

Reference: maskrcnn_benchmark/modeling/backbone/backbone.py:12-79. Returns a
BackboneDef bundling init/apply with static metadata (out_channels, strides).
FBNet parity is tracked separately (models/fbnet.py).
"""

import jax
import jax.numpy as jnp

from .fpn import apply_fpn, init_fpn, init_p6p7
from .resnet import ResNetConfig, apply_resnet, frozen_mask_resnet, init_resnet


class BackboneDef:
    def __init__(self, init, apply, frozen_mask, out_channels, strides):
        self.init = init
        self.apply = apply
        self.frozen_mask = frozen_mask
        self.out_channels = out_channels
        self.strides = strides  # feature stride per output level


def build_backbone(cfg):
    body = cfg.MODEL.BACKBONE.CONV_BODY
    if body.startswith("FBNet"):
        from .fbnet import build_fbnet_backbone

        return build_fbnet_backbone(cfg)
    rcfg = ResNetConfig(cfg)
    use_fpn = "FPN" in body
    retinanet = "RETINANET" in body

    if not use_fpn:
        # C4 / C5 body (backbone.py:12-20)
        out_channels = cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS
        stride = 16 if body.endswith("C4") else 32

        def init(key):
            return {"body": init_resnet(key, rcfg)}

        def apply(params, x, compute_dtype=jnp.bfloat16):
            return apply_resnet(params["body"], x, rcfg, compute_dtype)

        def frozen_mask(params):
            return {"body": frozen_mask_resnet(params["body"], rcfg)}

        return BackboneDef(init, apply, frozen_mask, out_channels, [stride])

    out_channels = cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS
    stage2_out = cfg.MODEL.RESNETS.RES2_OUT_CHANNELS
    use_gn = cfg.MODEL.FPN.USE_GN
    use_relu = cfg.MODEL.FPN.USE_RELU
    gn_groups = cfg.MODEL.GROUP_NORM.NUM_GROUPS

    if retinanet:
        # backbone.py:48-71 — FPN over C3..C5 + P6/P7
        in_channels_list = [0, stage2_out * 2, stage2_out * 4, stage2_out * 8]
        use_c5 = cfg.MODEL.RETINANET.USE_C5
        p67_in = stage2_out * 8 if use_c5 else out_channels
        strides = [8, 16, 32, 64, 128]

        def init(key):
            k1, k2, k3 = jax.random.split(key, 3)
            return {
                "body": init_resnet(k1, rcfg),
                "fpn": init_fpn(k2, in_channels_list, out_channels, use_gn),
                "top": init_p6p7(k3, p67_in, out_channels),
            }

        def apply(params, x, compute_dtype=jnp.bfloat16):
            feats = apply_resnet(params["body"], x, rcfg, compute_dtype)
            with jax.named_scope("fpn"):
                return apply_fpn(
                    params["fpn"], feats, use_gn, use_relu, gn_groups,
                    top_block="p6p7", top_block_params=params["top"],
                    p6p7_use_c5=use_c5, compute_dtype=compute_dtype,
                )

        def frozen_mask(params):
            return {
                "body": frozen_mask_resnet(params["body"], rcfg),
                "fpn": jax.tree.map(lambda _: False, params["fpn"]),
                "top": jax.tree.map(lambda _: False, params["top"]),
            }

        return BackboneDef(init, apply, frozen_mask, out_channels, strides)

    # standard FPN (backbone.py:23-45) — P2..P5 + maxpool P6
    in_channels_list = [stage2_out, stage2_out * 2, stage2_out * 4, stage2_out * 8]
    strides = [4, 8, 16, 32, 64]

    def init(key):
        k1, k2 = jax.random.split(key)
        return {
            "body": init_resnet(k1, rcfg),
            "fpn": init_fpn(k2, in_channels_list, out_channels, use_gn),
        }

    def apply(params, x, compute_dtype=jnp.bfloat16):
        feats = apply_resnet(params["body"], x, rcfg, compute_dtype)
        with jax.named_scope("fpn"):
            return apply_fpn(
                params["fpn"], feats, use_gn, use_relu, gn_groups,
                top_block="maxpool", compute_dtype=compute_dtype,
            )

    def frozen_mask(params):
        return {
            "body": frozen_mask_resnet(params["body"], rcfg),
            "fpn": jax.tree.map(lambda _: False, params["fpn"]),
        }

    return BackboneDef(init, apply, frozen_mask, out_channels, strides)
