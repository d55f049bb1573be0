#!/usr/bin/env python
"""Inference latency benchmark for any zoo config.

Default: Mask R-CNN R-50-FPN, batch 1, 800x1344 — reference single-V100
number 0.12966 s/im (+0.034 mask paste on host) (MODEL_ZOO.md:26).

Any other family via --config / --size / --baseline, e.g. the FBNet rows
the reference publishes at 600px b=1 (reference MODEL_ZOO.md:53-57):

  python tools/bench_inference.py 1 \\
      --config=configs/e2e_faster_rcnn_fbnet_600.yaml \\
      --size=600x1000 --baseline=0.0297

Run: python tools/bench_inference.py [BATCH] [--config=...] [--size=HxW]
     [--baseline=S_PER_IM]
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

BASELINE_S_PER_IM = 0.12966  # flagship Mask R-CNN R-50-FPN, V100 b=1


def _round_up(v, m):
    return (v + m - 1) // m * m


def main():
    from maskrcnn_tpu.models import build_detection_model

    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    b = int(pos[0]) if pos else 1
    config = None
    size = None
    baseline = None
    for a in sys.argv[1:]:
        if a.startswith("--config="):
            config = a.split("=", 1)[1]
        elif a.startswith("--size="):
            size = tuple(int(v) for v in a.split("=", 1)[1].split("x"))
        elif a.startswith("--baseline="):
            baseline = float(a.split("=", 1)[1])

    if config is None:
        from __graft_entry__ import _flagship_cfg

        c = _flagship_cfg(tiny=False)
        baseline = baseline or BASELINE_S_PER_IM
        name = "mask_rcnn_R_50_FPN"
    else:
        from maskrcnn_tpu.config import cfg

        c = cfg.clone()
        c.merge_from_file(
            os.path.join(os.path.dirname(__file__), "..", config)
        )
        c.MODEL.WEIGHT = ""
        name = os.path.splitext(os.path.basename(config))[0]
    if size is None:
        # the padded shape for the config's own test resolution: min size
        # on the short edge, max size on the long edge, rounded up to the
        # conv-stride multiple the collator uses (data/collate.py)
        size = (c.INPUT.MIN_SIZE_TEST, c.INPUT.MAX_SIZE_TEST)
    h, w = _round_up(size[0], 64), _round_up(size[1], 64)
    c.freeze()
    model = build_detection_model(c)
    params = model.init(jax.random.PRNGKey(0))

    rs = np.random.RandomState(0)
    batch = dict(
        images=jax.numpy.asarray(rs.randn(b, h, w, 3), jax.numpy.float32),
        image_sizes=jax.numpy.asarray([[size[0], size[1]]] * b,
                                      jax.numpy.int32),
    )
    infer = jax.jit(model.infer_forward)
    det = infer(params, batch)
    np.asarray(det["scores"])

    # fresh HOST numpy input each step + host fetch of the result:
    # end-to-end latency incl. the real host->device transfer
    # (block_until_ready under-reports on the axon tunnel)
    inputs = [
        np.asarray(rs.randn(b, h, w, 3), np.float32) for _ in range(4)
    ]
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        det = infer(params, dict(images=inputs[i % 4],
                                 image_sizes=batch["image_sizes"]))
        np.asarray(det["scores"])
    dt = (time.perf_counter() - t0) / iters
    s_per_im = dt / b
    vs = "  speedup vs V100: {:.2f}x".format(baseline / s_per_im) \
        if baseline else ""
    print(
        "{}: end-to-end (host numpy in/out): batch={} {}x{} {:.2f} ms/step"
        "  {:.4f} s/im{}".format(name, b, h, w, dt * 1000, s_per_im, vs)
    )

    # device-resident inputs: the reference's 0.1297 s/im excludes data
    # loading, so this is the apples-to-apples model-inference number (the
    # host numpy round trip above also pays this env's TPU tunnel — tens of
    # MB/s on a bad day — which a co-located host would not). Iterations
    # chain through a scalar data dependency so the whole sequence
    # pipelines device-side with ONE final host fetch — per-dispatch
    # tunnel round trips otherwise dominate (hundreds of ms/call observed)
    # and have nothing to do with the model.
    dev_input = jax.block_until_ready(jax.device_put(inputs[0]))

    @jax.jit
    def chained_step(s, images, image_sizes):
        imgs = images * (1.0 + s * 1e-12)
        det = infer(params, dict(images=imgs, image_sizes=image_sizes))
        return det["scores"].astype(jnp.float32).sum() * 1e-12

    sizes = jax.device_put(np.asarray([[size[0], size[1]]] * b, np.int32))
    s = chained_step(jnp.float32(0.0), dev_input, sizes)
    float(s)  # compile + sync
    s = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = chained_step(s, dev_input, sizes)
    float(s)
    dt = (time.perf_counter() - t0) / iters
    s_per_im = dt / b
    vs = "  speedup vs V100: {:.2f}x".format(baseline / s_per_im) \
        if baseline else ""
    print(
        "{}: device-resident model inference: batch={} {:.2f} ms/step"
        "  {:.4f} s/im{}".format(name, b, dt * 1000, s_per_im, vs)
    )


if __name__ == "__main__":
    main()
