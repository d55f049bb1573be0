"""Anchor generation (Detectron-exact cell anchors + on-device grids).

Cell anchors reproduce the reference/Detectron legacy math bit-for-bit —
round()ed sqrt aspect enumeration around a (0,0,stride-1,stride-1) window
(reference: maskrcnn_benchmark/modeling/rpn/anchor_generator.py:220-289).
They're tiny and static, so they're computed in numpy at build time; the
per-level grids are formed inside jit with broadcasted iota (XLA constant-
folds them per compiled image-bucket shape).

Visibility (straddle threshold) is computed against the true per-image size
inside the padded batch.
"""

import numpy as np


def _whctrs(anchor):
    w = anchor[2] - anchor[0] + 1
    h = anchor[3] - anchor[1] + 1
    return w, h, anchor[0] + 0.5 * (w - 1), anchor[1] + 0.5 * (h - 1)


def _mkanchors(ws, hs, x_ctr, y_ctr):
    ws = ws[:, None]
    hs = hs[:, None]
    return np.hstack(
        (
            x_ctr - 0.5 * (ws - 1),
            y_ctr - 0.5 * (hs - 1),
            x_ctr + 0.5 * (ws - 1),
            y_ctr + 0.5 * (hs - 1),
        )
    )


def _ratio_enum(anchor, ratios):
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    size = w * h
    ws = np.round(np.sqrt(size / ratios))
    hs = np.round(ws * ratios)
    return _mkanchors(ws, hs, x_ctr, y_ctr)


def _scale_enum(anchor, scales):
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    return _mkanchors(w * scales, h * scales, x_ctr, y_ctr)


def generate_cell_anchors(stride=16, sizes=(32, 64, 128, 256, 512), aspect_ratios=(0.5, 1, 2)):
    """[A, 4] float32 anchors centered on the (0,0) cell."""
    scales = np.array(sizes, np.float64) / stride
    ratios = np.array(aspect_ratios, np.float64)
    base = np.array([1, 1, stride, stride], np.float64) - 1
    anchors = _ratio_enum(base, ratios)
    anchors = np.vstack([_scale_enum(anchors[i], scales) for i in range(anchors.shape[0])])
    return anchors.astype(np.float32)


class AnchorGeneratorConfig:
    """Static anchor plan for a model: one cell-anchor set per level."""

    def __init__(self, sizes, aspect_ratios, strides, straddle_thresh):
        if len(strides) == 1:
            cell = [generate_cell_anchors(strides[0], sizes, aspect_ratios)]
        else:
            if len(strides) != len(sizes):
                raise RuntimeError("FPN should have #anchor_strides == #sizes")
            cell = [
                generate_cell_anchors(
                    stride,
                    size if isinstance(size, (tuple, list)) else (size,),
                    aspect_ratios,
                )
                for stride, size in zip(strides, sizes)
            ]
        self.cell_anchors = cell
        self.strides = list(strides)
        self.straddle_thresh = straddle_thresh

    def num_anchors_per_location(self):
        return [len(c) for c in self.cell_anchors]

    def grid_anchors_level(self, level, grid_h, grid_w):
        """Anchors for one level, [grid_h*grid_w*A, 4] float32 numpy-or-jnp
        depending on caller context (pure broadcasting; jit-safe)."""
        import jax.numpy as jnp

        cell = jnp.asarray(self.cell_anchors[level])  # [A, 4]
        stride = self.strides[level]
        shifts_x = jnp.arange(grid_w, dtype=jnp.float32) * stride
        shifts_y = jnp.arange(grid_h, dtype=jnp.float32) * stride
        sx = jnp.tile(shifts_x[None, :], (grid_h, 1)).reshape(-1)
        sy = jnp.tile(shifts_y[:, None], (1, grid_w)).reshape(-1)
        shifts = jnp.stack([sx, sy, sx, sy], axis=1)  # [HW, 4]
        return (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4)

    def visibility(self, anchors, image_h, image_w):
        """[N] bool mask of anchors inside the image by straddle_thresh
        (anchor_generator.py:97-110). image_h/w may be traced scalars."""
        import jax.numpy as jnp

        if self.straddle_thresh < 0:
            return jnp.ones(anchors.shape[:-1], bool)
        t = self.straddle_thresh
        return (
            (anchors[..., 0] >= -t)
            & (anchors[..., 1] >= -t)
            & (anchors[..., 2] < image_w + t)
            & (anchors[..., 3] < image_h + t)
        )


def make_anchor_generator(cfg):
    if cfg.MODEL.RPN.USE_FPN:
        assert len(cfg.MODEL.RPN.ANCHOR_STRIDE) == len(cfg.MODEL.RPN.ANCHOR_SIZES)
    else:
        assert len(cfg.MODEL.RPN.ANCHOR_STRIDE) == 1
    return AnchorGeneratorConfig(
        cfg.MODEL.RPN.ANCHOR_SIZES,
        cfg.MODEL.RPN.ASPECT_RATIOS,
        cfg.MODEL.RPN.ANCHOR_STRIDE,
        cfg.MODEL.RPN.STRADDLE_THRESH,
    )


def make_anchor_generator_retinanet(cfg):
    c = cfg.MODEL.RETINANET
    new_sizes = []
    for size in c.ANCHOR_SIZES:
        per_layer = tuple(
            c.OCTAVE ** (i / float(c.SCALES_PER_OCTAVE)) * size
            for i in range(c.SCALES_PER_OCTAVE)
        )
        new_sizes.append(per_layer)
    return AnchorGeneratorConfig(
        tuple(new_sizes), c.ASPECT_RATIOS, c.ANCHOR_STRIDES, c.STRADDLE_THRESH
    )
