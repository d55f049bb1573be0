#!/usr/bin/env python
"""Loader-only throughput benchmark (no TPU involved).

Measures sustained images/s of the full host input pipeline — JPEG decode,
resize, flip, normalize, fixed-shape collation with mask-patch
rasterization — over a realistic synthetic COCO set, for several
num_workers settings and across two epochs (the second epoch shows the
mask-patch cache effect).

The pipeline must sustain >= 2x the per-chip training throughput to keep a
chip fed with headroom (SURVEY.md hard part #6).
Run: python tools/bench_loader.py [--images 64] [--size 800x1066]
"""

import argparse
import os
import sys
import tempfile
import time

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def build(img_dir, ann_file, cfg):
    from maskrcnn_tpu.data.build import make_batch_sampler
    from maskrcnn_tpu.data.collate import BatchCollator
    from maskrcnn_tpu.data.datasets import COCODataset
    from maskrcnn_tpu.data.loader import DataLoader
    from maskrcnn_tpu.data.samplers import RandomSampler
    from maskrcnn_tpu.data.transforms import build_transforms

    dataset = COCODataset(
        ann_file,
        img_dir,
        remove_images_without_annotations=True,
        transforms=build_transforms(cfg, is_train=True),
    )
    collator = BatchCollator(cfg, is_train=True)
    return dataset, collator


def run_epochs(dataset, collator, cfg, num_workers, batch=8, epochs=2):
    """One continuous stream spanning `epochs` passes (training is a single
    IterationBased stream over 90k iters, so workers and their mask-patch
    caches persist); throughput is reported per pass."""
    from maskrcnn_tpu.data.build import make_batch_sampler
    from maskrcnn_tpu.data.loader import DataLoader
    from maskrcnn_tpu.data.samplers import RandomSampler

    iters_per_epoch = len(dataset) // batch
    sampler = RandomSampler(dataset)
    batch_sampler = make_batch_sampler(
        dataset, sampler, True, batch, num_iters=iters_per_epoch * epochs
    )
    loader = DataLoader(dataset, batch_sampler, collator, num_workers)
    rates = []
    n = 0
    t0 = time.perf_counter()
    for i, b in enumerate(loader):
        n += b["images"].shape[0]
        if (i + 1) % iters_per_epoch == 0:
            rates.append(n / (time.perf_counter() - t0))
            n = 0
            t0 = time.perf_counter()
    del b  # SHM batches are views; release before the loader closes its slots
    return rates


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--size", default="800x1066")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", default="0,2,4")
    args = ap.parse_args()
    h, w = (int(x) for x in args.size.split("x"))

    from synthetic_coco import make_synthetic_coco
    from maskrcnn_tpu.config import cfg as _cfg

    cfg = _cfg.clone()
    cfg.MODEL.MASK_ON = True
    cfg.DATALOADER.SIZE_DIVISIBILITY = 32

    with tempfile.TemporaryDirectory() as root:
        img_dir, ann_file = make_synthetic_coco(
            root, num_images=args.images, size=(h, w), num_classes=10,
            n_obj_range=(4, 16),
        )
        dataset, collator = build(img_dir, ann_file, cfg)
        print(
            "dataset: {} images @ {}x{}, batch {}".format(
                len(dataset), h, w, args.batch
            )
        )
        for nw in (int(x) for x in args.workers.split(",")):
            # fresh collator per setting so cache state is comparable
            c2 = type(collator)(cfg, is_train=True)
            rates = run_epochs(dataset, c2, cfg, nw, batch=args.batch)
            print(
                "num_workers={}: ".format(nw)
                + " | ".join(
                    "epoch{} {:6.1f} img/s".format(i, r) for i, r in enumerate(rates)
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
