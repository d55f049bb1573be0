"""Evaluation loop: run the model over a test loader, gather, evaluate.

Reference: maskrcnn_benchmark/engine/inference.py:17-120. Differences: model
outputs are padded fixed-shape dicts (converted to BoxLists here, at the
host boundary), and the multi-host gather uses comm.all_gather (JAX
multihost) instead of pickled NCCL tensors.
"""

import logging
import os
import pickle

import jax
import numpy as np

from ..data.evaluation import evaluate
from ..structures import BoxList
from ..utils import comm
from ..utils.timer import Timer
from .train_step import make_eval_step


class DetectionKeypoints:
    """Resize-aware wrapper for the [N, K, 4] (x, y, logit, prob) detection
    keypoints field — raw ndarray fields pass through BoxList.resize
    unscaled, which would leave keypoint coordinates in network-input space.
    """

    def __init__(self, data, size):
        self.data = np.asarray(data)
        self.size = tuple(size)

    def resize(self, size, *args, **kwargs):
        rw = float(size[0]) / self.size[0]
        rh = float(size[1]) / self.size[1]
        out = self.data.copy()
        out[..., 0] *= rw
        out[..., 1] *= rh
        return DetectionKeypoints(out, size)

    def transpose(self, method):
        out = self.data.copy()
        out[..., 0] = self.size[0] - out[..., 0] - 1
        return DetectionKeypoints(out, self.size)

    def __getitem__(self, item):
        return DetectionKeypoints(self.data[item], self.size)

    def __len__(self):
        return len(self.data)

    def __array__(self, dtype=None):
        return self.data.astype(dtype) if dtype else self.data

    def to_array(self):
        return self.data


def detections_to_boxlists(det, image_sizes):
    """Padded detection dict -> list of BoxLists (on the resized image)."""
    boxes = np.asarray(det["boxes"])
    scores = np.asarray(det["scores"])
    labels = np.asarray(det["labels"])
    valid = np.asarray(det["valid"])
    masks = np.asarray(det["masks"]) if "masks" in det else None
    kps = np.asarray(det["keypoints"]) if "keypoints" in det else None
    heatmaps = np.asarray(det["kp_heatmaps"]) if "kp_heatmaps" in det else None

    out = []
    for i in range(boxes.shape[0]):
        v = valid[i]
        h, w = int(image_sizes[i][0]), int(image_sizes[i][1])
        bl = BoxList(boxes[i][v], (w, h), mode="xyxy")
        bl.add_field("scores", scores[i][v])
        bl.add_field("labels", labels[i][v])
        if masks is not None:
            bl.add_field("mask", masks[i][v])
        if heatmaps is not None:
            # exact cv2-bicubic decode on host (reference inference.py:40-98)
            from ..models.roi_heads.keypoint_head import (
                heatmaps_to_keypoints_exact,
            )

            decoded = heatmaps_to_keypoints_exact(heatmaps[i][v], boxes[i][v])
            bl.add_field("keypoints", DetectionKeypoints(decoded, (w, h)))
        elif kps is not None:
            bl.add_field("keypoints", DetectionKeypoints(kps[i][v], (w, h)))
        out.append(bl)
    return out


def compute_on_dataset_bbox_aug(model, params, data_loader, cfg, timer=None):
    """Test-time-augmentation path (cfg.TEST.BBOX_AUG.ENABLED): batches are
    raw PIL images (BBoxAugCollator); multi-scale + flip detection via
    engine/bbox_aug."""
    import jax.numpy as jnp

    from .bbox_aug import im_detect_bbox_aug

    infer = jax.jit(model.infer_forward)

    def device_infer(b):
        return infer(params, {k: jnp.asarray(v) for k, v in b.items()})

    results = {}
    dataset = data_loader.dataset
    for batch in data_loader:
        images, _targets, idxs = batch
        if timer:
            timer.tic()
        boxlists = im_detect_bbox_aug(model, params, list(images), device_infer, cfg)
        if timer:
            timer.toc()
        for bl, idx in zip(boxlists, idxs):
            info = dataset.get_img_info(int(idx))
            results[int(idx)] = bl.resize((info["width"], info["height"]))
    return results


def compute_on_dataset(model, params, data_loader, mesh=None, timer=None):
    eval_step = make_eval_step(model, mesh)
    results = {}
    logger = logging.getLogger("maskrcnn_tpu.inference")
    dataset = data_loader.dataset
    for it, batch in enumerate(data_loader):
        arrays = {
            "images": batch["images"],
            "image_sizes": batch["image_sizes"],
        }
        if timer:
            timer.tic()
        det = eval_step(params, jax.tree.map(np.asarray, arrays))
        det = jax.tree.map(np.asarray, det)  # blocks
        if timer:
            timer.toc()
        boxlists = detections_to_boxlists(det, batch["image_sizes"])
        for i, idx in enumerate(batch["indices"]):
            info = dataset.get_img_info(int(idx))
            bl = boxlists[i].resize((info["width"], info["height"]))
            results[int(idx)] = bl
        if it % 50 == 0:
            logger.info("processed batch {} ({} images)".format(it, len(results)))
    return results


def inference(
    model,
    params,
    data_loader,
    dataset_name,
    iou_types=("bbox",),
    box_only=False,
    output_folder=None,
    expected_results=(),
    expected_results_sigma_tol=4,
    mesh=None,
    bbox_aug_cfg=None,
):
    logger = logging.getLogger("maskrcnn_tpu.inference")
    dataset = data_loader.dataset
    logger.info(
        "Start evaluation on {} dataset({} images).".format(dataset_name, len(dataset))
    )
    total_timer = Timer()
    inference_timer = Timer()
    total_timer.tic()
    if bbox_aug_cfg is not None and bbox_aug_cfg.TEST.BBOX_AUG.ENABLED:
        predictions = compute_on_dataset_bbox_aug(
            model, params, data_loader, bbox_aug_cfg, inference_timer
        )
    else:
        predictions = compute_on_dataset(model, params, data_loader, mesh, inference_timer)
    comm.synchronize()
    total_time = total_timer.toc()
    logger.info(
        "Total run time: {:.3f} s ({:.4f} s / img per device)".format(
            total_time, total_time / max(len(dataset), 1)
        )
    )
    logger.info(
        "Model inference time: {:.4f} s / img".format(
            inference_timer.total_time / max(len(predictions), 1)
        )
    )

    # merge across hosts
    all_preds = comm.all_gather(predictions)
    if not comm.is_main_process():
        return None
    predictions = {}
    for p in all_preds:
        predictions.update(p)
    image_ids = sorted(predictions.keys())
    if len(image_ids) != len(dataset):
        logger.warning(
            "Number of images that were gathered from multiple processes is not "
            "a contiguous set. Some images might be missing from the evaluation"
        )
    predictions = [predictions[i] for i in image_ids]

    if output_folder:
        os.makedirs(output_folder, exist_ok=True)
        with open(os.path.join(output_folder, "predictions.pkl"), "wb") as f:
            pickle.dump(predictions, f)

    return evaluate(
        dataset=dataset,
        predictions=predictions,
        output_folder=output_folder,
        iou_types=iou_types,
        box_only=box_only,
        expected_results=expected_results,
        expected_results_sigma_tol=expected_results_sigma_tol,
    )
