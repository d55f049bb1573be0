"""Test-time bounding-box augmentation (multi-scale + horizontal flip).

Reference: maskrcnn_benchmark/engine/bbox_aug.py:11-121 — run the box
pipeline at several scales (and h-flipped), union the detections, then a
single NMS pass caps them to DETECTIONS_PER_IMG.
"""

import numpy as np

from ..data.transforms import Compose, Normalize, Resize, ToArray
from ..structures import cat_boxlist
from ..structures.boxlist import FLIP_LEFT_RIGHT
from ..structures.boxlist_ops import boxlist_nms


def im_detect_bbox_aug(model, params, images, device_infer, cfg):
    """images: list of PIL images. Returns list of BoxLists (original size).

    `device_infer(batch_dict) -> detections dict` is the jitted single-scale
    path provided by the caller.
    """
    boxlists_ts = [[] for _ in images]

    def add_preds_t(boxlists_t):
        for i, boxlist_t in enumerate(boxlists_t):
            boxlists_ts[i].append(boxlist_t)

    add_preds_t(
        im_detect_bbox(
            model, params, images, cfg.INPUT.MIN_SIZE_TEST,
            cfg.INPUT.MAX_SIZE_TEST, device_infer, cfg,
        )
    )
    if cfg.TEST.BBOX_AUG.H_FLIP:
        add_preds_t(
            im_detect_bbox(
                model, params, images, cfg.INPUT.MIN_SIZE_TEST,
                cfg.INPUT.MAX_SIZE_TEST, device_infer, cfg, hflip=True,
            )
        )
    for scale in cfg.TEST.BBOX_AUG.SCALES:
        max_size = cfg.TEST.BBOX_AUG.MAX_SIZE
        add_preds_t(
            im_detect_bbox(model, params, images, scale, max_size, device_infer, cfg)
        )
        if cfg.TEST.BBOX_AUG.SCALE_H_FLIP:
            add_preds_t(
                im_detect_bbox(
                    model, params, images, scale, max_size, device_infer, cfg,
                    hflip=True,
                )
            )

    results = []
    for boxlists_img in boxlists_ts:
        merged = cat_boxlist(boxlists_img)
        kept = boxlist_nms(
            merged, cfg.MODEL.ROI_HEADS.NMS,
            max_proposals=cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG,
        )
        results.append(kept)
    return results


def im_detect_bbox(model, params, images, target_scale, target_max_size,
                   device_infer, cfg, hflip=False):
    """Single-scale (optionally flipped) detection pass on a list of PILs."""
    transform = Compose([
        Resize(target_scale, target_max_size),
        ToArray(),
        Normalize(cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD, cfg.INPUT.TO_BGR255),
    ])
    results = []
    div = max(cfg.DATALOADER.SIZE_DIVISIBILITY, 1)
    for pil in images:
        img = pil
        if hflip:
            from PIL import Image

            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        arr, _ = transform(img, None)
        h, w = arr.shape[:2]
        ph = -(-h // div) * div
        pw = -(-w // div) * div
        padded = np.zeros((1, ph, pw, 3), np.float32)
        padded[0, :h, :w] = arr
        det = device_infer(dict(
            images=padded, image_sizes=np.asarray([[h, w]], np.int32)
        ))
        from .inference import detections_to_boxlists

        (bl,) = detections_to_boxlists(
            {k: np.asarray(v) for k, v in det.items()},
            np.asarray([[h, w]]),
        )
        bl = bl.resize(pil.size)
        if hflip:
            bl = bl.transpose(FLIP_LEFT_RIGHT)
        results.append(bl)
    return results
