#!/usr/bin/env python
"""Training CLI.

Same surface as the reference tools/train_net.py:36-201 (--config-file,
--skip-test, KEY VALUE override list); the NCCL/DDP plumbing is replaced by
a jax device mesh (multi-host via jax.distributed when
MASKRCNN_TPU_COORDINATOR is set).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from maskrcnn_tpu.config import cfg
from maskrcnn_tpu.data import make_data_loader
from maskrcnn_tpu.engine.inference import inference
from maskrcnn_tpu.engine.trainer import do_train
from maskrcnn_tpu.models import build_detection_model
from maskrcnn_tpu.parallel import create_mesh, shard_params
from maskrcnn_tpu.solver import make_optimizer
from maskrcnn_tpu.utils import comm
from maskrcnn_tpu.utils.checkpoint import DetectronCheckpointer
from maskrcnn_tpu.utils.collect_env import collect_env_info
from maskrcnn_tpu.utils.logger import setup_logger
from maskrcnn_tpu.utils.miscellaneous import mkdir, save_config, save_labels


def train(cfg, output_dir, distributed):
    model = build_detection_model(cfg)
    mesh = create_mesh(cfg)
    n_data = mesh.shape["data"]
    if cfg.SOLVER.IMS_PER_BATCH % n_data != 0:
        raise ValueError(
            "SOLVER.IMS_PER_BATCH ({}) must be divisible by the data-parallel "
            "mesh size ({})".format(cfg.SOLVER.IMS_PER_BATCH, n_data)
        )

    rng = jax.random.PRNGKey(0)
    params = model.init(rng)
    frozen = model.frozen_mask(params)
    tx, schedule = make_optimizer(cfg, params, frozen)
    opt_state = tx.init(params)

    arguments = {"iteration": 0}
    checkpointer = DetectronCheckpointer(
        cfg, save_dir=output_dir,
        logger=setup_logger("maskrcnn_tpu.checkpointer", None, comm.get_rank()),
    )
    params, opt_state, extra = checkpointer.load(
        cfg.MODEL.WEIGHT, params=params, opt_state=opt_state
    )
    if "iteration" in extra:
        arguments["iteration"] = int(extra["iteration"])

    # replicated on a data-only mesh; output-channel tensor parallel when
    # cfg.TPU.MESH_AXES carries a 'model' axis (parallel/mesh.py)
    params = shard_params(params, mesh)
    opt_state = shard_params(opt_state, mesh)

    data_loader = make_data_loader(
        cfg, is_train=True, is_distributed=distributed,
        start_iter=arguments["iteration"],
    )
    if output_dir:
        save_labels([data_loader.dataset], output_dir)

    test_period = cfg.SOLVER.TEST_PERIOD
    run_validation = None
    if test_period > 0 and cfg.DATASETS.TEST:
        val_loaders = make_data_loader(cfg, is_train=False, is_distributed=distributed)

        def run_validation(val_params, iteration):
            for name, loader in zip(cfg.DATASETS.TEST, val_loaders):
                inference(
                    model, val_params, loader, dataset_name=name,
                    iou_types=("bbox",), box_only=cfg.MODEL.RPN_ONLY,
                    output_folder=None,
                )
                comm.synchronize()

    params, opt_state = do_train(
        model, tx, schedule, params, opt_state, data_loader, checkpointer,
        cfg.SOLVER.CHECKPOINT_PERIOD, arguments, mesh=mesh,
        test_period=test_period, run_validation=run_validation,
    )
    return model, params


def run_test(cfg, model, params, distributed):
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


def main():
    parser = argparse.ArgumentParser(description="TPU Object Detection Training")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--skip-test", dest="skip_test", action="store_true")
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

    output_dir = cfg.OUTPUT_DIR
    if output_dir:
        mkdir(output_dir)

    logger = setup_logger("maskrcnn_tpu", output_dir, comm.get_rank())
    logger.info("Using {} devices, {} processes".format(
        jax.device_count(), jax.process_count()))
    logger.info(args)
    logger.info("Collecting env info:\n" + collect_env_info())
    if args.config_file:
        logger.info("Loaded configuration file {}".format(args.config_file))
    logger.info("Running with config:\n{}".format(cfg))
    if output_dir:
        save_config(cfg, os.path.join(output_dir, "config.yml"))

    model, params = train(cfg, output_dir, distributed)
    if not args.skip_test:
        run_test(cfg, model, params, distributed)


if __name__ == "__main__":
    main()
