"""Synthetic COCO dataset fixture: images + annotations on disk.

Generates simple colored-rectangle scenes whose boxes/masks are exactly
known, so the full pipeline (dataset -> transforms -> collator -> train ->
eval) can run without real COCO data.
"""

import json
import os

import numpy as np


def make_synthetic_coco(root, num_images=8, size=(120, 160), num_classes=3,
                        seed=0, keypoints=False, n_obj_range=(1, 4)):
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    h, w = size
    from PIL import Image

    for i in range(num_images):
        img = (rng.rand(h, w, 3) * 60).astype(np.uint8)
        n_obj = rng.randint(*n_obj_range)
        for _ in range(n_obj):
            bw = rng.randint(20, w // 2)
            bh = rng.randint(20, h // 2)
            x0 = rng.randint(0, w - bw)
            y0 = rng.randint(0, h - bh)
            cat = int(rng.randint(1, num_classes + 1))
            color = np.array(
                [(60 + 60 * cat) % 256, (40 * cat) % 256, (255 - 50 * cat) % 256],
                np.uint8,
            )
            img[y0:y0 + bh, x0:x0 + bw] = color
            poly = [
                float(x0), float(y0), float(x0 + bw - 1), float(y0),
                float(x0 + bw - 1), float(y0 + bh - 1), float(x0), float(y0 + bh - 1),
            ]
            ann = {
                "id": ann_id,
                "image_id": i + 1,
                "category_id": cat,
                "bbox": [float(x0), float(y0), float(bw), float(bh)],
                "area": float(bw * bh),
                "iscrowd": 0,
                "segmentation": [poly],
            }
            if keypoints:
                kps = []
                for k in range(17):
                    kps += [float(x0 + bw // 2), float(y0 + bh // 2), 2]
                ann["keypoints"] = kps
                ann["num_keypoints"] = 17
            annotations.append(ann)
            ann_id += 1
        fn = "img_{:04d}.jpg".format(i)
        Image.fromarray(img).save(os.path.join(img_dir, fn))
        images.append({"id": i + 1, "file_name": fn, "height": h, "width": w})

    cats = [{"id": c, "name": "class{}".format(c)} for c in range(1, num_classes + 1)]
    ann_file = os.path.join(root, "instances.json")
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": cats}, f)
    return img_dir, ann_file
