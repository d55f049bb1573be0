#!/usr/bin/env python
"""Convert Cityscapes gtFine instance annotations to COCO-format JSON.

Reference: tools/cityscapes/convert_cityscapes_to_coco.py (which leans on
cityscapesscripts). This version reads the *_gtFine_polygons.json files
directly — no cityscapesscripts dependency — and emits
instancesonly_filtered_gtFine_{split}.json compatible with COCODataset.
"""

import argparse
import json
import os

INSTANCE_CLASSES = [
    "person",
    "rider",
    "car",
    "truck",
    "bus",
    "train",
    "motorcycle",
    "bicycle",
]


def poly_to_bbox(poly):
    xs = [p[0] for p in poly]
    ys = [p[1] for p in poly]
    x0, y0, x1, y1 = min(xs), min(ys), max(xs), max(ys)
    return [x0, y0, x1 - x0, y1 - y0]


def poly_area(poly):
    area = 0.0
    n = len(poly)
    for i in range(n):
        j = (i + 1) % n
        area += poly[i][0] * poly[j][1] - poly[j][0] * poly[i][1]
    return abs(area) / 2.0


def convert(gt_dir, img_dir, split, out_file):
    images = []
    annotations = []
    ann_id = 1
    img_id = 0
    cat_map = {name: i + 1 for i, name in enumerate(INSTANCE_CLASSES)}

    split_dir = os.path.join(gt_dir, split)
    for city in sorted(os.listdir(split_dir)):
        city_dir = os.path.join(split_dir, city)
        for fn in sorted(os.listdir(city_dir)):
            if not fn.endswith("_gtFine_polygons.json"):
                continue
            with open(os.path.join(city_dir, fn)) as f:
                data = json.load(f)
            img_id += 1
            stem = fn.replace("_gtFine_polygons.json", "")
            images.append(
                {
                    "id": img_id,
                    "file_name": os.path.join(
                        city, stem + "_leftImg8bit.png"
                    ),
                    "height": data["imgHeight"],
                    "width": data["imgWidth"],
                }
            )
            for obj in data["objects"]:
                label = obj["label"]
                crowd = 0
                if label.endswith("group"):
                    label = label[: -len("group")]
                    crowd = 1
                if label not in cat_map:
                    continue
                poly = obj["polygon"]
                if len(poly) < 3:
                    continue
                flat = [float(c) for p in poly for c in p]
                annotations.append(
                    {
                        "id": ann_id,
                        "image_id": img_id,
                        "category_id": cat_map[label],
                        "segmentation": [flat],
                        "bbox": poly_to_bbox(poly),
                        "area": poly_area(poly),
                        "iscrowd": crowd,
                    }
                )
                ann_id += 1

    out = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": i, "name": n} for n, i in cat_map.items()
        ],
    }
    os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
    with open(out_file, "w") as f:
        json.dump(out, f)
    print(
        "wrote {}: {} images, {} instances".format(
            out_file, len(images), len(annotations)
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt-dir", required=True, help=".../gtFine")
    ap.add_argument("--img-dir", default="", help=".../leftImg8bit (unused, kept for parity)")
    ap.add_argument("--split", default="val", choices=["train", "val", "test"])
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    convert(args.gt_dir, args.img_dir, args.split, args.out)


if __name__ == "__main__":
    main()
