#!/usr/bin/env python
"""Op-level TPU profile of the Mask R-CNN train step.

Captures a jax.profiler trace of a few steady-state train steps on the
attached chip, then parses the perfetto trace JSON and aggregates device
time by fused-op name. This is how we find the next kernel to optimize
(reference has no equivalent; SURVEY.md §5.1 notes it only wall-clocks).

Run: python tools/profile_train.py [BATCH]
"""

import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import numpy as np

import jax


def build_step(b):
    from __graft_entry__ import _flagship_cfg
    from maskrcnn_tpu.engine.train_step import make_train_step
    from maskrcnn_tpu.models import build_detection_model
    from maskrcnn_tpu.solver import make_optimizer

    # MASKRCNN_TPU_PROFILE_CONFIG overrides the flagship (e.g. the keypoint
    # or retinanet YAML) to profile other families
    override = os.environ.get("MASKRCNN_TPU_PROFILE_CONFIG")
    if override:
        from maskrcnn_tpu.config import cfg as _cfg

        c = _cfg.clone()
        c.merge_from_file(override)
        c.MODEL.WEIGHT = ""
    else:
        c = _flagship_cfg(tiny=False)
    c.freeze()
    model = build_detection_model(c)
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(c, params, model.frozen_mask(params))
    opt_state = tx.init(params)
    step = make_train_step(model, tx, donate=False)

    h, w = 800, 1344
    g = c.TPU.MAX_GT_BOXES
    rs = np.random.RandomState(0)
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_labels = np.zeros((b, g), np.int32)
    for i in range(b):
        n = int(np.clip(rs.lognormal(1.7, 0.8), 1, g))
        side = np.exp(rs.uniform(np.log(16), np.log(500), (n, 2)))
        ctr = rs.uniform(0, 1, (n, 2)) * np.array([w - 1, h - 1])
        lo = np.clip(ctr - side / 2, 0, None)
        hi = np.maximum(np.minimum(ctr + side / 2, [w - 1, h - 1]), lo + 2)
        gt_boxes[i, :n, :2] = lo
        gt_boxes[i, :n, 2:] = hi
        gt_labels[i, :n] = rs.randint(1, 81, n)
    batch = {
        "images": rs.randn(b, h, w, 3).astype(np.float32),
        "image_sizes": np.asarray([[800, 1333]] * b, np.int32),
        "gt_boxes": gt_boxes,
        "gt_labels": gt_labels,
    }
    if c.MODEL.MASK_ON and not c.MODEL.RETINANET_ON:
        mg = c.TPU.GT_MASK_SIZE  # pre-rasterized gt patches ride with the batch
        batch["gt_masks"] = (rs.rand(b, g, mg, mg) > 0.5).astype(np.uint8)
    if c.MODEL.KEYPOINT_ON and not c.MODEL.RETINANET_ON:
        kx = rs.uniform(0, w - 1, (b, g, 17, 1)).astype(np.float32)
        ky = rs.uniform(0, h - 1, (b, g, 17, 1)).astype(np.float32)
        kv = rs.randint(0, 3, (b, g, 17, 1)).astype(np.float32)
        batch["gt_keypoints"] = np.concatenate([kx, ky, kv], axis=-1)
        batch["gt_labels"] = np.minimum(gt_labels, 1)
    batch = jax.tree.map(jax.numpy.asarray, batch)
    return step, params, opt_state, batch


def build_infer(b):
    """--infer mode: profile infer_forward instead of the train step."""
    from __graft_entry__ import _flagship_cfg
    from maskrcnn_tpu.models import build_detection_model

    override = os.environ.get("MASKRCNN_TPU_PROFILE_CONFIG")
    if override:
        from maskrcnn_tpu.config import cfg as _cfg

        c = _cfg.clone()
        c.merge_from_file(override)
        c.MODEL.WEIGHT = ""
    else:
        c = _flagship_cfg(tiny=False)
    c.freeze()
    model = build_detection_model(c)
    params = model.init(jax.random.PRNGKey(0))
    h, w = 800, 1344
    rs = np.random.RandomState(0)
    batch = {
        "images": jax.numpy.asarray(
            rs.randn(b, h, w, 3).astype(np.float32)
        ),
        "image_sizes": jax.numpy.asarray([[800, 1333]] * b, np.int32),
    }
    infer = jax.jit(model.infer_forward)

    def step(params, _opt, batch, _rng):
        det = infer(params, batch)
        return None, None, {"loss": det["scores"].sum()}

    return step, params, None, batch


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    infer_mode = "--infer" in sys.argv
    b = int(args[0]) if args else (1 if infer_mode else 8)
    if infer_mode:
        step, params, opt_state, batch = build_infer(b)
    else:
        step, params, opt_state, batch = build_step(b)
    rng = jax.random.PRNGKey(1)

    # warm up / compile (scalar fetch: block_until_ready under-reports
    # through the axon tunnel — see bench.py)
    out = step(params, opt_state, batch, rng)
    float(out[2]["loss"])
    t0 = time.perf_counter()
    for _ in range(5):
        out = step(params, opt_state, batch, rng)
    float(out[2]["loss"])
    dt = (time.perf_counter() - t0) / 5
    print(f"steady-state: {dt * 1000:.1f} ms/step, {b / dt:.2f} img/s")

    logdir = tempfile.mkdtemp(prefix="jaxprof_")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = step(params, opt_state, batch, rng)
        jax.block_until_ready(out)

    traces = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    if not traces:
        print("no trace produced under", logdir)
        return
    with gzip.open(traces[0], "rt") as f:
        trace = json.load(f)

    events = trace.get("traceEvents", [])
    # device-track complete events carry op names; host threads are noise here
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}

    agg = defaultdict(float)
    meta = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        # skip envelopes, not ops: jit program spans and the "Steps" track
        # whose events are named by bare step number and span the whole step
        if name.startswith("jit_") or name.isdigit():
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        agg[name] += dur
        total += dur
        args = e.get("args") or {}
        src = args.get("tf_op") or args.get("long_name") or args.get("source") or ""
        if src and name not in meta:
            meta[name] = str(src)[:110]

    print(f"\ndevice op total: {total / 3:.1f} ms/step")

    # rollup by model phase (jax.named_scope annotations in the tf_op path)
    # finer backbone scopes first: "stem" must win over the enclosing
    # "backbone" in the first-substring-match attribution below
    SCOPES = (
        "stem", "layer1", "layer2", "layer3", "layer4", "fpn",
        "backbone", "rpn_head", "rpn_loss", "proposals", "box_targets",
        "box_head", "box_loss", "mask_head", "mask_targets",
        "keypoint_head", "keypoint_loss", "optimizer", "image_prep",
    )
    scopes = defaultdict(float)
    for k, v in agg.items():
        src = meta.get(k, "")
        hit = next((s for s in SCOPES if s in src), "<unattributed>")
        if hit != "<unattributed>" and "transpose(" in src:
            hit += " bwd"
        scopes[hit] += v
    print("\nby phase (named_scope):")
    for s, v in sorted(scopes.items(), key=lambda kv: -kv[1]):
        print(f"  {s:24s} {v / 3:8.2f} ms/step {100 * v / total:5.1f}%")

    unattr = [
        (k, v) for k, v in agg.items()
        if not any(s in meta.get(k, "") for s in SCOPES)
    ]
    if unattr:
        print("\ntop unattributed ops:")
        for k, v in sorted(unattr, key=lambda kv: -kv[1])[:10]:
            print(f"  {k[:40]:40s} {v / 3:8.2f} ms/step  {meta.get(k, '')[:70]}")

    # rollup by op family: which phase owns the time
    cats = defaultdict(float)
    for k, v in agg.items():
        src = meta.get(k, "")
        bwd = "transpose(" in src
        if "pallas_call" in src:
            c = "pallas bwd" if bwd else "pallas fwd"
        elif "conv_general_dilated" in src or "dot_general" in src:
            c = "matmul/conv bwd" if bwd else "matmul/conv fwd"
        elif "top_k" in src or "sort" in k:
            c = "sort/top_k"
        else:
            c = "other bwd" if bwd else "other"
        cats[c] += v
    for c, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {c:20s} {v / 3:8.2f} ms/step {100 * v / total:5.1f}%")

    print(f"\n{'op':44s} {'ms/step':>8s} {'%':>5s}  origin")
    top_n = int(os.environ.get("MASKRCNN_TPU_PROFILE_TOP", "45"))
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{k[:44]:44s} {v / 3:8.2f} {100 * v / total:5.1f}  {meta.get(k, '')}")


if __name__ == "__main__":
    main()
