#!/usr/bin/env python
"""Single-chip train throughput for the non-flagship model families.

bench.py owns the flagship (Mask R-CNN R-50-FPN) driver metric; this tool
fills in the zoo perf table: Faster R-CNN, Keypoint R-CNN and RetinaNet at
the same 800x1344 batch-8 conditions and realistic GT statistics.

Run: python tools/bench_families.py [BATCH]
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

# (name, yaml, batch_override or None = CLI batch)
CONFIGS = [
    ("faster_rcnn_R_50_FPN", "configs/e2e_faster_rcnn_R_50_FPN_1x.yaml", None),
    ("keypoint_rcnn_R_50_FPN", "configs/e2e_keypoint_rcnn_R_50_FPN_1x.yaml", None),
    ("retinanet_R_50_FPN", "configs/retinanet/retinanet_R-50-FPN_1x.yaml", None),
    # The zoo's heaviest row (reference MODEL_ZOO.md:24,28): exercises
    # grouped convolution (num_groups=32, width_per_group=8).
    ("mask_rcnn_X_101_32x8d_FPN", "configs/e2e_mask_rcnn_X_101_32x8d_FPN_1x.yaml", None),
    # C4 family (reference MODEL_ZOO.md:21,25): single-level res4 features +
    # res5 box head; the reference trains it at 1 img/GPU.
    ("faster_rcnn_R_50_C4", "configs/e2e_faster_rcnn_R_50_C4_1x.yaml", None),
    ("mask_rcnn_R_50_C4", "configs/e2e_mask_rcnn_R_50_C4_1x.yaml", None),
    # deformable-conv family (reference configs/dcn/): proves DCN *trains*
    # at speed on TPU, not just applies.
    # REMAT on: the deform-conv offset-gather activations ([B, H, W, 9C]
    # at P2) push batch-8 past HBM without per-block recompute
    ("mask_rcnn_dconv_R_50_FPN", "configs/dcn/e2e_mask_rcnn_dconv_R_50_FPN_1x.yaml", None,
     ("TPU.REMAT_BACKBONE", "'all'")),
]


def make_batch(c, b, rs):
    h, w = 800, 1344
    g = c.TPU.MAX_GT_BOXES
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_labels = np.zeros((b, g), np.int32)
    for i in range(b):
        n_gt = int(np.clip(rs.lognormal(mean=1.7, sigma=0.8), 1, g))
        side = np.exp(rs.uniform(np.log(16), np.log(500), (n_gt, 2)))
        ctr = rs.uniform(0, 1, (n_gt, 2)) * np.array([w - 1, h - 1])
        lo = np.clip(ctr - side / 2, 0, None)
        hi = np.maximum(np.minimum(ctr + side / 2, [w - 1, h - 1]), lo + 2)
        gt_boxes[i, :n_gt, :2] = lo
        gt_boxes[i, :n_gt, 2:] = hi
        gt_labels[i, :n_gt] = rs.randint(1, c.MODEL.ROI_BOX_HEAD.NUM_CLASSES, n_gt)
    batch = dict(
        images=rs.randn(b, h, w, 3).astype(np.float32),
        image_sizes=np.asarray([[800, 1333]] * b, np.int32),
        gt_boxes=gt_boxes,
        gt_labels=gt_labels,
    )
    if c.MODEL.MASK_ON:
        s = c.TPU.GT_MASK_SIZE
        batch["gt_masks"] = (rs.rand(b, g, s, s) > 0.5).astype(np.uint8)
    if c.MODEL.KEYPOINT_ON:
        kx = rs.uniform(0, w - 1, (b, g, 17, 1)).astype(np.float32)
        ky = rs.uniform(0, h - 1, (b, g, 17, 1)).astype(np.float32)
        kv = rs.randint(0, 3, (b, g, 17, 1)).astype(np.float32)
        batch["gt_keypoints"] = np.concatenate([kx, ky, kv], axis=-1)
        batch["gt_labels"] = np.minimum(gt_labels, 1)  # person-only
    return jax.tree.map(jax.numpy.asarray, batch)


def bench_one(name, yaml, b, opts=()):
    from maskrcnn_tpu.config import cfg
    from maskrcnn_tpu.engine.train_step import make_train_step
    from maskrcnn_tpu.models import build_detection_model
    from maskrcnn_tpu.solver import make_optimizer

    c = cfg.clone()
    c.merge_from_file(os.path.join(os.path.dirname(__file__), "..", yaml))
    if opts:
        c.merge_from_list(list(opts))
    c.MODEL.WEIGHT = ""
    c.freeze()
    model = build_detection_model(c)
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(c, params, model.frozen_mask(params))
    opt_state = tx.init(params)
    rs = np.random.RandomState(0)
    batch = make_batch(c, b, rs)
    step = make_train_step(model, tx, mesh=None, donate=True)
    rng = jax.random.PRNGKey(1)
    params, opt_state, m = step(params, opt_state, batch, rng)
    float(m["loss"])  # compile + sync (block_until_ready lies on the tunnel)
    iters = 8
    keys = list(jax.random.split(rng, iters))
    for k in keys:
        k.block_until_ready()
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, m = step(params, opt_state, batch, keys[i])
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters

    from maskrcnn_tpu.utils.flops import compiled_flops, mfu_fields

    # fresh (undonated) pytrees for the lowering-only cost analysis
    params2 = model.init(jax.random.PRNGKey(0))
    flops = compiled_flops(
        step, params2, tx.init(params2), batch, keys[0]
    )
    eff = mfu_fields(flops, dt)
    print(
        "{:26s} {:7.1f} ms/step  {:6.2f} img/s/chip (batch {})  "
        "TFLOP/s {:6.2f}  MFU {:5.1f}%".format(
            name, dt * 1000, b / dt, b,
            eff.get("tflops_per_sec", float("nan")),
            100 * eff.get("mfu", float("nan")),
        ),
        flush=True,
    )


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    b = int(pos[0]) if pos else 8
    only = [
        part
        for a in sys.argv[1:] if a.startswith("--only=")
        for part in a.split("=", 1)[1].split(",")
    ]
    for row in CONFIGS:
        name, yaml, b_over = row[:3]
        if only and not any(s in name for s in only):
            continue
        bench_one(name, yaml, b_over or b, opts=row[3] if len(row) > 3 else ())


if __name__ == "__main__":
    main()
