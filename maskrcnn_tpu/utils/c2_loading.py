"""Detectron (Caffe2 .pkl) and torch-zoo (.pth) weight import.

Reference: maskrcnn_benchmark/utils/c2_model_loading.py:12-206. Two stages:
  1. blob names -> reference torch-style keys (same rename rules:
     res2->layer1, branch2a->conv1, bn s/b -> weight/bias, fpn_inner{i}, ...)
  2. torch-style keys -> this framework's param-tree paths with layout
     conversion: conv OIHW->HWIO, linear [out,in]->[in,out], deconv
     [in,out,kh,kw]->HW+flip, and NCHW->NHWC input permutation for the
     first fc after a flatten (fc6).

Suffix matching (model_serialization) aligns partial checkpoints (ImageNet
backbones) into the full detector tree.
"""

import logging
import pickle
import re

import numpy as np

from .checkpoint import _flatten_params, _unflatten_params
from .model_serialization import align_and_update_state_dicts, strip_prefix_if_present

logger = logging.getLogger(__name__)


# -- stage 1: C2 blob names -> torch-style keys -------------------------------------


def _rename_basic(k):
    k = k.replace("_", ".")
    k = k.replace(".w", ".weight") if k.endswith(".w") else k
    k = k.replace(".bn", "_bn")
    k = k.replace(".b", ".bias") if k.endswith(".b") else k
    k = k.replace("_bn.s", "_bn.scale") if k.endswith("_bn.s") else k
    k = k.replace(".biasranch", ".branch")
    k = k.replace("bbox.pred", "bbox_pred")
    k = k.replace("cls.score", "cls_score")
    k = k.replace("res.conv1_", "conv1_")
    k = k.replace(".biasbox", ".bbox")
    k = k.replace("conv.rpn", "rpn.conv")
    k = k.replace("rpn.bbox.pred", "rpn.bbox_pred")
    k = k.replace("rpn.cls.logits", "rpn.cls_logits")
    k = k.replace("_bn.scale", "_bn.weight")
    k = k.replace("conv1_bn.", "bn1.")
    k = k.replace("res2.", "layer1.")
    k = k.replace("res3.", "layer2.")
    k = k.replace("res4.", "layer3.")
    k = k.replace("res5.", "layer4.")
    k = k.replace(".branch2a.", ".conv1.")
    k = k.replace(".branch2a_bn.", ".bn1.")
    k = k.replace(".branch2b.", ".conv2.")
    k = k.replace(".branch2b_bn.", ".bn2.")
    k = k.replace(".branch2c.", ".conv3.")
    k = k.replace(".branch2c_bn.", ".bn3.")
    k = k.replace(".branch1.", ".downsample.0.")
    k = k.replace(".branch1_bn.", ".downsample.1.")
    # GroupNorm backbones
    k = k.replace("conv1.gn.s", "bn1.weight")
    k = k.replace("conv1.gn.bias", "bn1.bias")
    k = k.replace("conv2.gn.s", "bn2.weight")
    k = k.replace("conv2.gn.bias", "bn2.bias")
    k = k.replace("conv3.gn.s", "bn3.weight")
    k = k.replace("conv3.gn.bias", "bn3.bias")
    k = k.replace("downsample.0.gn.s", "downsample.1.weight")
    k = k.replace("downsample.0.gn.bias", "downsample.1.bias")
    return k


def _rename_fpn(k, stage_names=("1.2", "2.3", "3.5", "4.2")):
    # Detectron FPN blob names carry (stage, last-block) pairs; defaults are
    # R-50's (overridden per-depth by _stage_names_for_depth).
    for mapped_idx, stage in enumerate(stage_names, 1):
        suffix = ".lateral" if mapped_idx < 4 else ""
        k = k.replace(
            "fpn.inner.layer{}.sum{}".format(stage, suffix),
            "fpn_inner{}".format(mapped_idx),
        )
        k = k.replace("fpn.layer{}.sum".format(stage), "fpn_layer{}".format(mapped_idx))
    k = k.replace("rpn.conv.fpn2", "rpn.conv")
    k = k.replace("rpn.bbox_pred.fpn2", "rpn.bbox_pred")
    k = k.replace("rpn.cls_logits.fpn2", "rpn.cls_logits")
    return k


def _rename_heads(k):
    k = k.replace("mask.fcn.logits", "mask_fcn_logits")
    k = k.replace(".[mask].fcn", "mask_fcn")
    k = k.replace("conv5.mask", "conv5_mask")
    k = k.replace("kps.score.lowres", "kps_score_lowres")
    k = k.replace("kps.score", "kps_score")
    k = k.replace("conv.fcn", "conv_fcn")
    k = re.sub(r"^rpn\.", "rpn.head.", k)
    return k


def rename_c2_blobs(weights, layer3_blocks=6):
    """C2 blob dict -> torch-style-keyed dict (values unchanged)."""
    stage_names = (
        "1.2",
        "2.3",
        {6: "3.5", 23: "3.22", 36: "3.35"}.get(layer3_blocks, "3.5"),
        "4.2",
    )
    out = {}
    for k in sorted(weights.keys()):
        if "_momentum" in k or k in ("lr", "model_iter", "__preserve__"):
            continue
        nk = k
        if nk == "pred_b":
            nk = "fc1000_b"
        if nk == "pred_w":
            nk = "fc1000_w"
        nk = _rename_basic(nk)
        nk = _rename_fpn(nk, stage_names)
        nk = _rename_heads(nk)
        v = np.asarray(weights[k])
        out[nk] = v
    return out


# -- stage 2: torch-style keys -> this framework's tree ------------------------------


def torchstyle_key_for_path(path):
    """My tree path ("backbone/body/layer1/0/conv1/w") -> reference
    state-dict key ("backbone.body.layer1.0.conv1.weight")."""
    parts = path.split("/")
    out = []
    i = 0
    n = len(parts)
    while i < n:
        p = parts[i]
        if p == "fpn" and i + 2 < n and parts[i + 1] in ("inner", "layer"):
            idx = int(parts[i + 2]) + 1
            out.append("fpn")
            out.append("fpn_{}{}".format(parts[i + 1], idx))
            i += 4  # skip "conv" too
            continue
        if p == "top" and i + 1 < n and parts[i + 1] in ("p6", "p7"):
            out.append("fpn.top_blocks")
            out.append(parts[i + 1])
            i += 2
            continue
        if p == "downsample":
            nxt = parts[i + 1]
            if nxt == "conv":
                out.append("downsample.0")
            else:  # bn
                out.append("downsample.1")
            i += 2
            continue
        if p == "rpn":
            out.append("rpn.head")
            i += 1
            continue
        if p == "convs":  # stacked conv lists in heads
            idx = int(parts[i + 1])
            head_kind = parts[i - 1] if i > 0 else ""
            # mask extractor convs are mask_fcn{k}; keypoint conv_fcn{k};
            # xconv head: xconvs.{k}
            out.append("__CONVK{}".format(idx))
            i += 2
            if i < n and parts[i] == "conv":
                i += 1
            continue
        if p in ("cls_tower", "bbox_tower"):
            idx = int(parts[i + 1])
            out.append("{}.{}".format(p, 2 * idx))  # Sequential conv,relu pairs
            i += 2
            continue
        if p == "w":
            out.append("weight")
            i += 1
            continue
        if p == "b":
            out.append("bias")
            i += 1
            continue
        if p in ("scale", "bias", "mean", "var") and i > 0 and (
            parts[i - 1].startswith("bn") or parts[i - 1] in ("gn",)
        ):
            out.append(
                {"scale": "weight", "bias": "bias", "mean": "running_mean",
                 "var": "running_var"}[p]
            )
            i += 1
            continue
        out.append(p)
        i += 1
    return ".".join(out)


def _resolve_convk(key, path):
    """Fill the __CONVK placeholder by head kind."""
    m = re.search(r"__CONVK(\d+)", key)
    if not m:
        return key
    idx = int(m.group(1))
    if "/mask/" in path:
        repl = "mask_fcn{}".format(idx + 1)
    elif "/keypoint/" in path:
        repl = "conv_fcn{}".format(idx + 1)
    else:
        repl = "xconvs.{}".format(3 * idx)  # conv,gn?,relu — approximate
    return key.replace(m.group(0), repl)


def _convert_leaf(path, template_leaf, value):
    """Layout conversion from torch/C2 to NHWC functional params."""
    value = np.asarray(value, np.float32)
    t = np.asarray(template_leaf)
    if value.ndim == 4 and t.ndim == 4:
        if "conv5_mask" in path or "kps_score_lowres" in path:
            # deconv: torch [in, out, kh, kw] -> HWIO (I=in) + spatial flip
            # (lax.conv_transpose correlates with the kernel as-is; torch's
            # ConvTranspose2d is the conv gradient = flipped kernel —
            # verified numerically against torch)
            v = np.flip(value.transpose(2, 3, 0, 1), axis=(0, 1))
        else:
            # conv: OIHW -> HWIO
            v = value.transpose(2, 3, 1, 0)
        return v
    if value.ndim == 2 and t.ndim == 2:
        return value.T  # [out, in] -> [in, out]
    return value.reshape(t.shape)


def _fc6_permutation(value, c, h, w):
    """fc6 weights expect NCHW-flattened input; our flatten is NHWC."""
    out_dim = value.shape[0]
    v = value.reshape(out_dim, c, h, w).transpose(0, 2, 3, 1).reshape(out_dim, -1)
    return v.T


def load_torchstyle_state(state, template_params, cfg=None):
    """Map a torch-style-keyed dict of numpy arrays onto my param tree."""
    t_flat = _flatten_params(template_params)
    path_to_key = {}
    for path, t in t_flat.items():
        if t is None:  # structural placeholder (absent FPN lateral etc.)
            continue
        key = _resolve_convk(torchstyle_key_for_path(path), "/" + path + "/")
        path_to_key[path] = key

    match = align_and_update_state_dicts(list(path_to_key.values()), list(state.keys()))

    merged = {}
    n_loaded = 0
    for path, t in t_flat.items():
        if t is None:
            merged[path] = None
            continue
        key = path_to_key[path]
        lk = match.get(key)
        if lk is None:
            merged[path] = t
            continue
        value = np.asarray(state[lk])
        # fc6 after conv flatten needs channel reorder
        if path.endswith("fc6/w") and value.ndim == 2:
            res_area = value.shape[1]
            # infer (C, H, W): channels divide; pooled maps are square
            c_candidates = [2048, 1024, 512, 256]
            done = False
            for c in c_candidates:
                if res_area % c == 0:
                    hw = res_area // c
                    s = int(round(hw ** 0.5))
                    if s * s == hw:
                        merged[path] = _fc6_permutation(value, c, s, s).astype(np.float32)
                        done = True
                        break
            if not done:
                merged[path] = value.T.astype(np.float32)
        else:
            try:
                merged[path] = _convert_leaf(path, t, value).astype(np.float32)
            except ValueError:
                logger.warning("shape mismatch for %s <- %s %s vs %s", path, lk,
                               value.shape, t.shape)
                merged[path] = t
                continue
        if merged[path].shape != t.shape:
            logger.warning("converted shape mismatch for %s: %s vs %s", path,
                           merged[path].shape, t.shape)
            merged[path] = t
        else:
            n_loaded += 1
    logger.info("loaded %d/%d tensors from checkpoint", n_loaded, len(t_flat))
    return _unflatten_params(merged)


def load_c2_weights(path, cfg, template_params):
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    if "blobs" in data:
        data = data["blobs"]
    # infer depth from blob names (res4_22 present => R-101)
    layer3_blocks = 6
    if any(k.startswith("res4_22") for k in data):
        layer3_blocks = 23
    if any(k.startswith("res4_35") for k in data):
        layer3_blocks = 36
    state = rename_c2_blobs(data, layer3_blocks)
    return load_torchstyle_state(state, template_params, cfg)


def load_pth_weights(path, cfg, template_params):
    """Load a reference-framework .pth checkpoint (torch state_dict)."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if "model" in data:
        data = data["model"]
    data = strip_prefix_if_present(data, "module.")
    state = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in data.items()}
    return load_torchstyle_state(state, template_params, cfg)
