#!/usr/bin/env python
"""Evaluation CLI (reference tools/test_net.py:27-114)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from maskrcnn_tpu.config import cfg
from maskrcnn_tpu.data import make_data_loader
from maskrcnn_tpu.engine.inference import inference
from maskrcnn_tpu.models import build_detection_model
from maskrcnn_tpu.utils import comm
from maskrcnn_tpu.utils.checkpoint import DetectronCheckpointer
from maskrcnn_tpu.utils.collect_env import collect_env_info
from maskrcnn_tpu.utils.logger import setup_logger
from maskrcnn_tpu.utils.miscellaneous import mkdir


def main():
    parser = argparse.ArgumentParser(description="TPU Object Detection Inference")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--ckpt", default=None,
                        help="checkpoint file; defaults to last_checkpoint")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    coordinator = os.environ.get("MASKRCNN_TPU_COORDINATOR")
    if coordinator:
        jax.distributed.initialize(coordinator_address=coordinator)
    distributed = jax.process_count() > 1

    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()

    save_dir = ""
    logger = setup_logger("maskrcnn_tpu", save_dir, comm.get_rank())
    logger.info("Using {} devices".format(jax.device_count()))
    logger.info(cfg)
    logger.info("Collecting env info:\n" + collect_env_info())

    model = build_detection_model(cfg)
    params = model.init(jax.random.PRNGKey(0))

    output_dir = cfg.OUTPUT_DIR
    checkpointer = DetectronCheckpointer(cfg, save_dir=output_dir, logger=logger)
    ckpt = cfg.MODEL.WEIGHT if args.ckpt is None else args.ckpt
    params, _, _ = checkpointer.load(ckpt, params=params)

    iou_types = ("bbox",)
    if cfg.MODEL.MASK_ON:
        iou_types = iou_types + ("segm",)
    if cfg.MODEL.KEYPOINT_ON:
        iou_types = iou_types + ("keypoints",)

    output_folders = [None] * len(cfg.DATASETS.TEST)
    dataset_names = cfg.DATASETS.TEST
    if cfg.OUTPUT_DIR:
        for idx, dataset_name in enumerate(dataset_names):
            output_folder = os.path.join(cfg.OUTPUT_DIR, "inference", dataset_name)
            mkdir(output_folder)
            output_folders[idx] = output_folder
    data_loaders = make_data_loader(cfg, is_train=False, is_distributed=distributed)
    for output_folder, dataset_name, data_loader in zip(
        output_folders, dataset_names, data_loaders
    ):
        inference(
            model, params, data_loader, dataset_name=dataset_name,
            iou_types=iou_types, box_only=cfg.MODEL.RPN_ONLY,
            output_folder=output_folder,
            expected_results=cfg.TEST.EXPECTED_RESULTS,
            expected_results_sigma_tol=cfg.TEST.EXPECTED_RESULTS_SIGMA_TOL,
            bbox_aug_cfg=cfg,
        )
        comm.synchronize()


if __name__ == "__main__":
    main()
