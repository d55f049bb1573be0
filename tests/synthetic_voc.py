"""Synthetic Pascal-VOC dataset fixture (XML annotations on disk)."""

import os

import numpy as np


def make_synthetic_voc(root, num_images=4, size=(120, 160), seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    h, w = size
    ann_dir = os.path.join(root, "Annotations")
    img_dir = os.path.join(root, "JPEGImages")
    set_dir = os.path.join(root, "ImageSets", "Main")
    for d in (ann_dir, img_dir, set_dir):
        os.makedirs(d, exist_ok=True)

    classes = ["person", "car", "dog"]
    ids = []
    for i in range(num_images):
        img_id = "{:06d}".format(i)
        ids.append(img_id)
        img = (rng.rand(h, w, 3) * 60).astype(np.uint8)
        objs = []
        for _ in range(rng.randint(1, 3)):
            bw = rng.randint(20, w // 2)
            bh = rng.randint(20, h // 2)
            x0 = rng.randint(0, w - bw)
            y0 = rng.randint(0, h - bh)
            name = classes[rng.randint(len(classes))]
            img[y0:y0 + bh, x0:x0 + bw] = (90, 140, 200)
            objs.append(
                "<object><name>{}</name><difficult>0</difficult>"
                "<bndbox><xmin>{}</xmin><ymin>{}</ymin>"
                "<xmax>{}</xmax><ymax>{}</ymax></bndbox></object>".format(
                    name, x0 + 1, y0 + 1, x0 + bw, y0 + bh
                )
            )
        Image.fromarray(img).save(os.path.join(img_dir, img_id + ".jpg"))
        with open(os.path.join(ann_dir, img_id + ".xml"), "w") as f:
            f.write(
                "<annotation><size><width>{}</width><height>{}</height>"
                "<depth>3</depth></size>{}</annotation>".format(
                    w, h, "".join(objs)
                )
            )
    with open(os.path.join(set_dir, "test.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    return root
