"""Misc small utilities (reference utils/miscellaneous.py)."""

import json
import os

from . import comm


def mkdir(path):
    os.makedirs(path, exist_ok=True)


def save_labels(dataset_list, output_dir):
    if comm.is_main_process():
        ids_to_labels = {}
        for dataset in dataset_list:
            if hasattr(dataset, "categories"):
                ids_to_labels.update(dataset.categories)
        if ids_to_labels:
            with open(os.path.join(output_dir, "labels.json"), "w") as f:
                json.dump(ids_to_labels, f, indent=2)


def save_config(cfg, path):
    if comm.is_main_process():
        with open(path, "w") as f:
            f.write(cfg.dump())
