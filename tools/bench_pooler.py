#!/usr/bin/env python
"""ROIAlign pooler fwd/bwd strategy benchmark on the attached TPU chip.

Training-shape comparison of:
  - gather fwd (+XLA autodiff scatter bwd)     [round-1 training path]
  - pallas patch-DMA fwd (+pallas RMW bwd)     [round-1, known slow bwd]
  - pallas patch-DMA fwd (+XLA windowed scatter-add bwd)   [round-2]

Timing is tunnel-safe: every iteration is chained through a scalar data
dependency and only the final scalar is host-fetched (block_until_ready
under-reports through the axon tunnel).
Run: python tools/bench_pooler.py
"""

import functools
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


def make_inputs(rng, b, r, p, clustered=False):
    feats = [
        jnp.asarray(rng.randn(b, 200, 336, 256), jnp.bfloat16),
        jnp.asarray(rng.randn(b, 100, 168, 256), jnp.bfloat16),
        jnp.asarray(rng.randn(b, 50, 84, 256), jnp.bfloat16),
        jnp.asarray(rng.randn(b, 25, 42, 256), jnp.bfloat16),
    ]
    if clustered:
        # training-like: sampled ROIs cluster around ~6 gt objects per
        # image (box-head positives + near-misses), so many share pooler
        # windows — the regime the window-merged kernels exploit
        n_obj = 6
        ctr_obj = rng.uniform(100, 700, (b, n_obj, 2))
        wh_obj = np.exp(rng.uniform(np.log(40), np.log(300), (b, n_obj, 2)))
        per = r // b
        pick = rng.randint(0, n_obj, (b, per))
        ctr = np.take_along_axis(ctr_obj, pick[..., None], 1)
        wh = np.take_along_axis(wh_obj, pick[..., None], 1)
        ctr = ctr + rng.randn(b, per, 2) * wh * 0.15
        wh = wh * np.exp(rng.randn(b, per, 2) * 0.2)
        ctr = ctr.reshape(r, 2)
        wh = wh.reshape(r, 2)
        bidx = jnp.asarray(np.repeat(np.arange(b), per), jnp.int32)
    else:
        ctr = rng.uniform(100, 700, (r, 2))
        wh = rng.uniform(30, 300, (r, 2))
        bidx = jnp.asarray(rng.randint(0, b, r), jnp.int32)
    rois = jnp.asarray(np.concatenate([ctr - wh / 2, ctr + wh / 2], -1), jnp.float32)
    cot = jnp.asarray(rng.randn(r, p, p, 256), jnp.bfloat16)
    return feats, rois, bidx, cot


def chained_time(step, s0, *args, iters=10):
    s = step(s0, *args)
    float(s)  # compile + sync
    s = s0
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(s, *args)
    float(s)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from maskrcnn_tpu.models.poolers import PoolerConfig, multilevel_roi_align
    from maskrcnn_tpu.ops.pallas.roi_align_kernel import make_trainable_roi_align

    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    b = 8
    clustered = "--clustered" in sys.argv
    impls = ("roi", "rmw") if clustered else ("rmw", "scatter")
    for a in sys.argv[1:]:
        if a.startswith("--impls="):
            impls = tuple(a.split("=", 1)[1].split(","))

    for name, r, p in [("box-head", b * 512, 7), ("mask-head", b * 128, 14)]:
        pcfg = PoolerConfig(p, (0.25, 0.125, 0.0625, 0.03125), 2)
        feats, rois, bidx, cot = make_inputs(rng, b, r, p, clustered=clustered)

        pools = {
            "gather": lambda fs: multilevel_roi_align(
                list(fs), rois, bidx, pcfg, backend="gather"
            ),
        }
        for impl in impls:
            pools["pallas+" + impl] = make_wrap(
                make_trainable_roi_align(pcfg, bwd_impl=impl), rois, bidx
            )

        for pname, pool in pools.items():
            # forward only
            @jax.jit
            def fstep(s, feats, pool=pool):
                sc = (1.0 + s * 1e-12).astype(jnp.bfloat16)
                out = pool([f * sc for f in feats])
                return out.astype(jnp.float32).mean()

            tf = chained_time(fstep, jnp.float32(0.0), feats)

            # forward+backward wrt features
            @jax.jit
            def gstep(s, feats, cot, pool=pool):
                sc = (1.0 + s * 1e-12).astype(jnp.bfloat16)
                fs = [f * sc for f in feats]
                loss, grads = jax.value_and_grad(
                    lambda fs: (pool(fs).astype(jnp.float32) * cot.astype(jnp.float32)).sum()
                )(fs)
                probe = sum(g.astype(jnp.float32)[0, 0, 0, 0] for g in grads)
                return loss * 1e-12 + probe

            tg = chained_time(gstep, jnp.float32(0.0), feats, cot)
            print(
                "{:9s} r={:5d} p={:2d} {:15s}: fwd {:7.2f} ms | fwd+bwd {:7.2f} ms".format(
                    name, r, p, pname, tf, tg
                ),
                flush=True,
            )


def make_wrap(fn, rois, bidx):
    def pool(fs):
        return fn(tuple(fs), rois, bidx)

    return pool


if __name__ == "__main__":
    main()
