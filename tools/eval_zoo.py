#!/usr/bin/env python
"""One-command zoo-model acceptance run.

Downloads (or reads) a Detectron/zoo checkpoint, converts it, evaluates on
the configured (or explicitly given) COCO-format dataset, and asserts
cfg.TEST.EXPECTED_RESULTS — the reference's acceptance gate
(coco_eval.py:377-396 + MODEL_ZOO.md). The caffe2/*.yaml configs ship with
the published MODEL_ZOO AP values in TEST.EXPECTED_RESULTS, so as soon as
COCO data is reachable:

    python tools/eval_zoo.py --config-file configs/caffe2/e2e_mask_rcnn_R_50_FPN_1x_caffe2.yaml \
        --ann-file /data/coco/annotations/instances_minival2014.json \
        --img-dir /data/coco/val2014

exits non-zero unless box AP lands within the published band. --weight
overrides cfg.MODEL.WEIGHT (catalog:// URI, URL, .pkl/.pth/.npz path).
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(description="Zoo model acceptance eval")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--weight", default=None,
                        help="checkpoint override (catalog://, URL or path)")
    parser.add_argument("--ann-file", default=None,
                        help="COCO-format annotation json (overrides DATASETS.TEST)")
    parser.add_argument("--img-dir", default=None)
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    import jax

    from maskrcnn_tpu.config import cfg
    from maskrcnn_tpu.data import make_data_loader
    from maskrcnn_tpu.engine.inference import inference
    from maskrcnn_tpu.models import build_detection_model
    from maskrcnn_tpu.utils.checkpoint import DetectronCheckpointer
    from maskrcnn_tpu.utils.logger import setup_logger

    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    if args.weight:
        cfg.MODEL.WEIGHT = args.weight

    tmp_catalog = None
    if args.ann_file:
        assert args.img_dir, "--img-dir is required with --ann-file"
        tmp_catalog = tempfile.NamedTemporaryFile(
            "w", suffix="_catalog.py", delete=False
        )
        tmp_catalog.write(
            "class DatasetCatalog:\n"
            "    @staticmethod\n"
            "    def get(name):\n"
            "        return dict(factory='COCODataset', args=dict(\n"
            "            root={!r}, ann_file={!r},\n"
            "            remove_images_without_annotations=False))\n"
            "from maskrcnn_tpu.config.paths_catalog import ModelCatalog\n".format(
                os.path.abspath(args.img_dir), os.path.abspath(args.ann_file)
            )
        )
        tmp_catalog.close()
        cfg.PATHS_CATALOG = tmp_catalog.name
        cfg.DATASETS.TEST = ("zoo_eval",)
    cfg.freeze()

    output_dir = args.output_dir or os.path.join(
        cfg.OUTPUT_DIR or ".", "zoo_eval"
    )
    os.makedirs(output_dir, exist_ok=True)
    logger = setup_logger("maskrcnn_tpu", output_dir, 0)
    logger.info("Evaluating {} with weight {}".format(
        args.config_file, cfg.MODEL.WEIGHT
    ))

    model = build_detection_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    checkpointer = DetectronCheckpointer(cfg, save_dir=output_dir)
    params, _, _ = checkpointer.load(cfg.MODEL.WEIGHT, params=params)

    iou_types = ("bbox",)
    if cfg.MODEL.MASK_ON:
        iou_types = iou_types + ("segm",)
    if cfg.MODEL.KEYPOINT_ON:
        iou_types = iou_types + ("keypoints",)

    loaders = make_data_loader(cfg, is_train=False, is_distributed=False)
    for name, loader in zip(cfg.DATASETS.TEST, loaders):
        inference(
            model,
            params,
            loader,
            dataset_name=name,
            iou_types=iou_types,
            box_only=cfg.MODEL.RPN_ONLY,
            output_folder=os.path.join(output_dir, name),
            expected_results=cfg.TEST.EXPECTED_RESULTS,
            expected_results_sigma_tol=cfg.TEST.EXPECTED_RESULTS_SIGMA_TOL,
            bbox_aug_cfg=cfg,
        )
    logger.info("zoo eval complete; EXPECTED_RESULTS gate passed")


if __name__ == "__main__":
    main()
