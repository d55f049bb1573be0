"""COCODemo: single-image inference + visualization API.

Reference: demo/predictor.py:45-471. Public surface preserved:
COCODemo(cfg, confidence_threshold=...).run_on_opencv_image(bgr_image).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from maskrcnn_tpu.engine.inference import detections_to_boxlists
from maskrcnn_tpu.models import build_detection_model
from maskrcnn_tpu.models.masker import Masker
from maskrcnn_tpu.structures.keypoints import PersonKeypoints
from maskrcnn_tpu.utils.checkpoint import DetectronCheckpointer


class COCODemo:
    CATEGORIES = [
        "__background", "person", "bicycle", "car", "motorcycle", "airplane",
        "bus", "train", "truck", "boat", "traffic light", "fire hydrant",
        "stop sign", "parking meter", "bench", "bird", "cat", "dog", "horse",
        "sheep", "cow", "elephant", "bear", "zebra", "giraffe", "backpack",
        "umbrella", "handbag", "tie", "suitcase", "frisbee", "skis",
        "snowboard", "sports ball", "kite", "baseball bat", "baseball glove",
        "skateboard", "surfboard", "tennis racket", "bottle", "wine glass",
        "cup", "fork", "knife", "spoon", "bowl", "banana", "apple",
        "sandwich", "orange", "broccoli", "carrot", "hot dog", "pizza",
        "donut", "cake", "chair", "couch", "potted plant", "bed",
        "dining table", "toilet", "tv", "laptop", "mouse", "remote",
        "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
        "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
        "hair drier", "toothbrush",
    ]

    def __init__(
        self,
        cfg,
        confidence_threshold=0.7,
        show_mask_heatmaps=False,
        masks_per_dim=2,
        min_image_size=224,
        weight_loading=None,
    ):
        self.cfg = cfg.clone()
        self.model = build_detection_model(self.cfg)
        self.min_image_size = min_image_size

        self.params = self.model.init(jax.random.PRNGKey(0))
        save_dir = cfg.OUTPUT_DIR
        checkpointer = DetectronCheckpointer(cfg, save_dir=save_dir)
        weight = weight_loading or cfg.MODEL.WEIGHT
        if weight:
            self.params, _, _ = checkpointer.load(weight, params=self.params)

        self.masker = Masker(threshold=0.5, padding=1)
        self.confidence_threshold = confidence_threshold
        self.show_mask_heatmaps = show_mask_heatmaps
        self.masks_per_dim = masks_per_dim
        self._infer = jax.jit(self.model.infer_forward)

        mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32)
        std = np.asarray(cfg.INPUT.PIXEL_STD, np.float32)
        self.to_bgr255 = cfg.INPUT.TO_BGR255
        self.pixel_mean = mean
        self.pixel_std = std

    # -- preprocessing -----------------------------------------------------

    def _preprocess(self, bgr_image):
        import cv2

        h, w = bgr_image.shape[:2]
        size = self.min_image_size
        max_size = self.cfg.INPUT.MAX_SIZE_TEST
        scale = size / min(h, w)
        if max(h, w) * scale > max_size:
            scale = max_size / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        img = cv2.resize(bgr_image, (nw, nh), interpolation=cv2.INTER_LINEAR)
        img = img.astype(np.float32)
        if not self.to_bgr255:
            img = img[:, :, ::-1] / 255.0
        img = (img - self.pixel_mean) / self.pixel_std

        div = max(self.cfg.DATALOADER.SIZE_DIVISIBILITY, 1)
        ph = -(-nh // div) * div
        pw = -(-nw // div) * div
        padded = np.zeros((1, ph, pw, 3), np.float32)
        padded[0, :nh, :nw] = img
        return padded, (nh, nw)

    # -- public API -------------------------------------------------------------

    def compute_prediction(self, original_image):
        images, (nh, nw) = self._preprocess(original_image)
        batch = dict(
            images=images,
            image_sizes=np.asarray([[nh, nw]], np.int32),
        )
        det = self._infer(self.params, jax.tree.map(jax.numpy.asarray, batch))
        det = jax.tree.map(np.asarray, det)
        (prediction,) = detections_to_boxlists(det, batch["image_sizes"])
        height, width = original_image.shape[:-1]
        prediction = prediction.resize((width, height))
        if prediction.has_field("mask"):
            masks = prediction.get_field("mask")
            pasted = self.masker(masks, prediction)
            prediction.add_field("mask", pasted)
        return prediction

    def select_top_predictions(self, predictions):
        keep = np.nonzero(
            np.asarray(predictions.get_field("scores")) > self.confidence_threshold
        )[0]
        predictions = predictions[keep]
        scores = np.asarray(predictions.get_field("scores"))
        idx = np.argsort(-scores)
        return predictions[idx]

    def run_on_opencv_image(self, image):
        predictions = self.compute_prediction(image)
        top_predictions = self.select_top_predictions(predictions)
        result = image.copy()
        if self.show_mask_heatmaps:
            return self.create_mask_montage(result, top_predictions)
        result = self.overlay_boxes(result, top_predictions)
        if self.cfg.MODEL.MASK_ON and top_predictions.has_field("mask"):
            result = self.overlay_mask(result, top_predictions)
        if self.cfg.MODEL.KEYPOINT_ON and top_predictions.has_field("keypoints"):
            result = self.overlay_keypoints(result, top_predictions)
        result = self.overlay_class_names(result, top_predictions)
        return result

    # -- drawing ------------------------------------------------------------------

    def compute_colors_for_labels(self, labels):
        palette = np.array([2 ** 25 - 1, 2 ** 15 - 1, 2 ** 21 - 1])
        colors = labels[:, None] * palette[None, :]
        colors = (colors % 255).astype(np.uint8)
        return colors

    def overlay_boxes(self, image, predictions):
        import cv2

        labels = np.asarray(predictions.get_field("labels"))
        boxes = predictions.bbox
        colors = self.compute_colors_for_labels(labels).tolist()
        for box, color in zip(boxes, colors):
            box = box.astype(np.int64)
            top_left, bottom_right = tuple(box[:2]), tuple(box[2:])
            image = cv2.rectangle(
                image, top_left, bottom_right, tuple(map(int, color)), 1
            )
        return image

    def overlay_mask(self, image, predictions):
        import cv2

        masks = np.asarray(predictions.get_field("mask"))
        labels = np.asarray(predictions.get_field("labels"))
        colors = self.compute_colors_for_labels(labels).tolist()
        for mask, color in zip(masks, colors):
            contours, _ = cv2.findContours(
                mask.astype(np.uint8), cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE
            )[-2:]
            image = cv2.drawContours(image, contours, -1, tuple(map(int, color)), 3)
        return image

    def overlay_keypoints(self, image, predictions):
        keypoints = np.asarray(predictions.get_field("keypoints"))
        kps = np.concatenate(
            [keypoints[:, :, :2], keypoints[:, :, 3:4]], axis=2
        ).transpose(0, 2, 1)
        for region in kps:
            image = vis_keypoints(image, region)
        return image

    def create_mask_montage(self, image, predictions):
        import cv2

        masks = np.asarray(predictions.get_field("mask"))
        masks_per_dim = self.masks_per_dim
        masks = np.stack(
            [
                cv2.resize(m.astype(np.float32), None, fx=1 / masks_per_dim,
                           fy=1 / masks_per_dim)
                for m in masks
            ]
        ) if len(masks) else masks
        if len(masks) == 0:
            return image
        height, width = masks.shape[1:]
        max_masks = masks_per_dim ** 2
        masks = masks[:max_masks]
        result = np.zeros((masks_per_dim * height, masks_per_dim * width), np.float32)
        for idx, mask in enumerate(masks):
            y = idx // masks_per_dim
            x = idx % masks_per_dim
            result[y * height:(y + 1) * height, x * width:(x + 1) * width] = mask
        return cv2.applyColorMap((result * 255).astype(np.uint8), cv2.COLORMAP_JET)

    def overlay_class_names(self, image, predictions):
        import cv2

        scores = np.asarray(predictions.get_field("scores")).tolist()
        labels = np.asarray(predictions.get_field("labels")).tolist()
        label_names = [self.CATEGORIES[int(i)] for i in labels]
        boxes = predictions.bbox
        template = "{}: {:.2f}"
        for box, score, label in zip(boxes, scores, label_names):
            x, y = int(box[0]), int(box[1])
            s = template.format(label, score)
            cv2.putText(
                image, s, (x, y), cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255), 1
            )
        return image


def vis_keypoints(img, kps, kp_thresh=2, alpha=0.7):
    """Draw the COCO person skeleton (reference predictor.py:410-471)."""
    import cv2
    import matplotlib

    dataset_keypoints = PersonKeypoints.NAMES
    kp_lines = PersonKeypoints.CONNECTIONS

    cmap = matplotlib.colormaps.get_cmap("rainbow")
    colors = [cmap(i) for i in np.linspace(0, 1, len(kp_lines) + 2)]
    colors = [(c[2] * 255, c[1] * 255, c[0] * 255) for c in colors]

    kp_mask = np.copy(img)

    mid_shoulder = (
        kps[:2, dataset_keypoints.index("right_shoulder")]
        + kps[:2, dataset_keypoints.index("left_shoulder")]
    ) / 2.0
    sc_mid_shoulder = np.minimum(
        kps[2, dataset_keypoints.index("right_shoulder")],
        kps[2, dataset_keypoints.index("left_shoulder")],
    )
    mid_hip = (
        kps[:2, dataset_keypoints.index("right_hip")]
        + kps[:2, dataset_keypoints.index("left_hip")]
    ) / 2.0
    sc_mid_hip = np.minimum(
        kps[2, dataset_keypoints.index("right_hip")],
        kps[2, dataset_keypoints.index("left_hip")],
    )
    nose_idx = dataset_keypoints.index("nose")
    if sc_mid_shoulder > kp_thresh and kps[2, nose_idx] > kp_thresh:
        cv2.line(
            kp_mask, tuple(mid_shoulder.astype(np.int32)),
            tuple(kps[:2, nose_idx].astype(np.int32)),
            color=colors[len(kp_lines)], thickness=2, lineType=cv2.LINE_AA,
        )
    if sc_mid_shoulder > kp_thresh and sc_mid_hip > kp_thresh:
        cv2.line(
            kp_mask, tuple(mid_shoulder.astype(np.int32)),
            tuple(mid_hip.astype(np.int32)),
            color=colors[len(kp_lines) + 1], thickness=2, lineType=cv2.LINE_AA,
        )
    for l in range(len(kp_lines)):
        i1, i2 = kp_lines[l]
        p1 = kps[0, i1].astype(np.int32), kps[1, i1].astype(np.int32)
        p2 = kps[0, i2].astype(np.int32), kps[1, i2].astype(np.int32)
        if kps[2, i1] > kp_thresh and kps[2, i2] > kp_thresh:
            cv2.line(kp_mask, p1, p2, color=colors[l], thickness=2,
                     lineType=cv2.LINE_AA)
        if kps[2, i1] > kp_thresh:
            cv2.circle(kp_mask, p1, radius=3, color=colors[l], thickness=-1,
                       lineType=cv2.LINE_AA)
        if kps[2, i2] > kp_thresh:
            cv2.circle(kp_mask, p2, radius=3, color=colors[l], thickness=-1,
                       lineType=cv2.LINE_AA)
    return cv2.addWeighted(img, 1.0 - alpha, kp_mask, alpha, 0)
