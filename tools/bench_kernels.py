#!/usr/bin/env python
"""Kernel microbenchmarks on the attached TPU chip.

Covers the [NATIVE] kernel list from SURVEY.md §2.1: NMS (Pallas blocked
kernel vs lax fallback), fused multi-level ROIAlign, ROIPool, focal loss,
deformable conv. Also verifies the Pallas NMS against the numpy golden on
hardware. Run: python tools/bench_kernels.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from maskrcnn_tpu.ops.nms import batched_nms_mask, nms_numpy
    from maskrcnn_tpu.ops.pallas.nms_kernel import nms_mask_pallas
    from maskrcnn_tpu.models.poolers import PoolerConfig, multilevel_roi_align
    from maskrcnn_tpu.ops.losses import sigmoid_focal_loss
    from maskrcnn_tpu.ops.deform_conv import deform_conv2d

    rng = np.random.RandomState(0)
    print("device:", jax.devices()[0])

    # --- NMS ---
    for g, n in [(5, 1000), (8 * 5, 2000), (80, 128)]:
        ctr = rng.uniform(0, 800, (g, n, 2))
        wh = rng.uniform(10, 200, (g, n, 2))
        boxes = jnp.asarray(
            np.concatenate([ctr - wh / 2, ctr + wh / 2], -1), jnp.float32
        )
        scores = jnp.asarray(rng.uniform(size=(g, n)), jnp.float32)
        valid = jnp.ones((g, n), bool)
        f_p = jax.jit(lambda b, s, v: nms_mask_pallas(b, s, v, 0.7))
        f_j = jax.jit(lambda b, s, v: batched_nms_mask(b, s, v, 0.7))
        tp = timeit(f_p, boxes, scores, valid)
        tj = timeit(f_j, boxes, scores, valid)
        # hardware correctness check on the first lane
        keep = np.asarray(f_p(boxes, scores, valid))[0]
        exp = np.zeros(n, bool)
        exp[nms_numpy(np.asarray(boxes[0]), np.asarray(scores[0]), 0.7)] = True
        ok = (keep == exp).all()
        print(
            "nms g={:3d} n={:5d}: pallas {:7.2f} ms | lax {:7.2f} ms | "
            "speedup {:4.1f}x | exact={}".format(g, n, tp, tj, tj / tp, ok)
        )

    # --- anchor matcher (RPN assignment shape) ---
    from maskrcnn_tpu.ops.matcher import match_anchors_streaming
    from maskrcnn_tpu.ops.pallas.matcher_kernel import match_anchors_pallas

    n_anc, b, g = 268569, 8, 100
    anchors = (rng.rand(n_anc, 4) * 800).astype(np.float32)
    anchors[:, 2:] += anchors[:, :2] + 4
    gtb = (rng.rand(b, g, 4) * 600).astype(np.float32)
    gtb[..., 2:] += gtb[..., :2] + 30
    gvm = np.arange(g)[None, :] < rng.randint(1, 20, b)[:, None]
    anchors, gtb, gvm = map(jnp.asarray, (anchors, gtb, gvm))
    f_p = jax.jit(lambda a, gb, gv: match_anchors_pallas(a, gb, gv, 0.7, 0.3).sum())
    f_s = jax.jit(
        lambda a, gb, gv: jax.vmap(
            lambda x, y: match_anchors_streaming(a, x, y, 0.7, 0.3)
        )(gb, gv).sum()
    )
    tp = timeit(f_p, anchors, gtb, gvm)
    ts = timeit(f_s, anchors, gtb, gvm)
    out_p = np.asarray(match_anchors_pallas(anchors, gtb, gvm, 0.7, 0.3))
    out_s = np.asarray(
        jax.vmap(lambda x, y: match_anchors_streaming(anchors, x, y, 0.7, 0.3))(
            gtb, gvm
        )
    )
    print(
        "anchor matcher 8x270k, <=19 gt: pallas {:.2f} ms | streaming {:.2f} ms"
        " | speedup {:.1f}x | exact={}".format(
            tp, ts, ts / tp, bool((out_p == out_s).all())
        )
    )

    # --- multi-level ROIAlign (box head shape) ---
    feats = [
        jnp.asarray(rng.randn(8, 200, 336, 256), jnp.bfloat16),
        jnp.asarray(rng.randn(8, 100, 168, 256), jnp.bfloat16),
        jnp.asarray(rng.randn(8, 50, 84, 256), jnp.bfloat16),
        jnp.asarray(rng.randn(8, 25, 42, 256), jnp.bfloat16),
    ]
    pcfg = PoolerConfig(7, (0.25, 0.125, 0.0625, 0.03125), 2)
    r = 8 * 512
    ctr = rng.uniform(100, 700, (r, 2))
    wh = rng.uniform(30, 300, (r, 2))
    rois = jnp.asarray(np.concatenate([ctr - wh / 2, ctr + wh / 2], -1), jnp.float32)
    bidx = jnp.asarray(rng.randint(0, 8, r), jnp.int32)
    f = jax.jit(lambda *fs: multilevel_roi_align(list(fs[:-2]), fs[-2], fs[-1], pcfg))
    t = timeit(f, *feats, rois, bidx)
    print("multilevel_roi_align 4096 rois 7x7x256: {:.2f} ms".format(t))

    # --- focal loss ---
    logits = jnp.asarray(rng.randn(8, 250000, 80), jnp.float32)
    targets = jnp.asarray(rng.randint(-1, 81, (8, 250000)), jnp.int32)
    f = jax.jit(lambda l, t: sigmoid_focal_loss(l, t).sum())
    t = timeit(f, logits, targets)
    print("sigmoid_focal_loss 8x250k anchors x80: {:.2f} ms".format(t))

    # --- deformable conv ---
    x = jnp.asarray(rng.randn(2, 100, 168, 256), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 256, 256) * 0.01, jnp.float32)
    off = jnp.asarray(rng.randn(2, 100, 168, 18) * 0.5, jnp.float32)
    f = jax.jit(lambda x, o, w: deform_conv2d(x, o, w, padding=1))
    t = timeit(f, x, off, w, iters=10)
    print("deform_conv 2x100x168x256 k3: {:.2f} ms".format(t))


if __name__ == "__main__":
    main()
