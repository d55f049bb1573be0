"""Synthetic Cityscapes gtFine fixture: leftImg8bit/ + gtFine/ trees with
paired *_polygons.json and *_instanceIds.png annotations describing the
same axis-aligned rectangle instances, so both dataset modes can be tested
against exactly known geometry."""

import json
import os

import numpy as np
from PIL import Image

# (name, cityscapes label id)
LABELS = {"person": 24, "car": 26, "bicycle": 33}


def make_synthetic_cityscapes(root, split="val", num_images=3, size=(128, 256),
                              seed=0):
    """Returns (img_dir, ann_dir, instances) where instances[i] is the list
    of (class_name, (x0, y0, x1, y1)) rectangles of image i (y1/x1
    exclusive raster bounds)."""
    rng = np.random.RandomState(seed)
    h, w = size
    img_root = os.path.join(root, "leftImg8bit")
    ann_root = os.path.join(root, "gtFine")
    city = "testcity"
    img_dir = os.path.join(img_root, split, city)
    ann_dir = os.path.join(ann_root, split, city)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    all_insts = []
    names = sorted(LABELS)
    for i in range(num_images):
        img = (rng.rand(h, w, 3) * 80).astype(np.uint8)
        ids = np.zeros((h, w), np.int32)
        objects = []
        insts = []
        counts = {}
        # one instance per quadrant -> instances never overlap (keeps the
        # mask/poly modes equivalent and evaluation outcomes deterministic)
        n_obj = rng.randint(2, 5)
        cells = [(0, 0), (0, 1), (1, 0), (1, 1)][:n_obj]
        for j, (cy, cx) in enumerate(cells):
            name = names[rng.randint(len(names))]
            ch, cw = h // 2, w // 2
            bw = rng.randint(24, cw - 2)
            bh = rng.randint(24, ch - 2)
            x0 = cx * cw + int(rng.randint(0, cw - bw))
            y0 = cy * ch + int(rng.randint(0, ch - bh))
            x1, y1 = x0 + bw, y0 + bh
            counts[name] = counts.get(name, 0) + 1
            inst_id = LABELS[name] * 1000 + counts[name]
            ids[y0:y1, x0:x1] = inst_id
            img[y0:y1, x0:x1] = (40 * (j + 2)) % 255
            # polygon vertices: inclusive pixel corners like the official
            # annotations (x1-1 / y1-1 are the last covered columns/rows)
            objects.append(
                {
                    "label": name,
                    "polygon": [
                        [x0, y0], [x1 - 1, y0], [x1 - 1, y1 - 1], [x0, y1 - 1]
                    ],
                }
            )
            insts.append((name, (x0, y0, x1, y1)))
        # a group + a non-instance label must both be ignored by the loader
        objects.append({"label": "cargroup", "polygon": [[0, 0], [5, 0], [5, 5]]})
        objects.append({"label": "sky", "polygon": [[0, 0], [9, 0], [9, 9]]})

        base = "{}_{:06d}_000019".format(city, i)
        Image.fromarray(img).save(
            os.path.join(img_dir, base + "_leftImg8bit.png")
        )
        Image.fromarray(ids.astype(np.uint16)).save(
            os.path.join(ann_dir, base + "_gtFine_instanceIds.png")
        )
        with open(
            os.path.join(ann_dir, base + "_gtFine_polygons.json"), "w"
        ) as f:
            json.dump({"imgHeight": h, "imgWidth": w, "objects": objects}, f)
        all_insts.append(insts)
    return img_root, ann_root, all_insts
