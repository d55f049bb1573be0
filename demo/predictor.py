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

        # heatmap mode needs graded probabilities: threshold=-1 makes the
        # masker paste 0-255 probability maps instead of binary masks
        # (reference predictor.py:118-123)
        mask_threshold = -1 if show_mask_heatmaps else 0.5
        self.masker = Masker(threshold=mask_threshold, padding=1)
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
    # Per-class colors come from a golden-angle hue wheel (class_color):
    # consecutive class ids land ~137.5 degrees apart on the hue circle, so
    # any subset of classes stays visually distinct without a stored palette.

    def class_color(self, label):
        """Deterministic BGR color for a class id."""
        import colorsys

        hue = (int(label) * 0.61803398875) % 1.0
        r, g, b = colorsys.hsv_to_rgb(hue, 0.85, 0.95)
        return int(b * 255), int(g * 255), int(r * 255)

    def overlay_boxes(self, image, predictions):
        import cv2

        labels = np.asarray(predictions.get_field("labels"))
        boxes = np.asarray(predictions.bbox, np.int64)
        for (x0, y0, x1, y1), label in zip(boxes.tolist(), labels.tolist()):
            cv2.rectangle(
                image, (x0, y0), (x1, y1), self.class_color(label), 1
            )
        return image

    def overlay_mask(self, image, predictions):
        """Translucent class-colored fill plus a hard border, both derived
        from the binary mask itself (morphological gradient) — no contour
        extraction needed."""
        import cv2

        masks = np.asarray(predictions.get_field("mask")).astype(np.uint8)
        labels = np.asarray(predictions.get_field("labels"))
        if masks.ndim == 4:
            masks = masks[:, 0]
        kernel = np.ones((3, 3), np.uint8)
        for mask, label in zip(masks, labels.tolist()):
            color = np.asarray(self.class_color(label), np.float32)
            inside = mask.astype(bool)
            image[inside] = (
                0.55 * image[inside] + 0.45 * color
            ).astype(np.uint8)
            border = cv2.dilate(mask, kernel, iterations=2) - cv2.erode(
                mask, kernel, iterations=1
            )
            image[border.astype(bool)] = color.astype(np.uint8)
        return image

    def overlay_keypoints(self, image, predictions):
        keypoints = np.asarray(predictions.get_field("keypoints"))  # [N,K,4]
        for inst in keypoints:
            image = draw_person_skeleton(
                image, inst[:, :2], inst[:, 3], self.class_color
            )
        return image

    def create_mask_montage(self, image, predictions):
        """Tile the first masks_per_dim^2 mask probability maps into one
        heat-mapped grid (built with a single reshape/transpose)."""
        import cv2

        masks = np.asarray(predictions.get_field("mask"), np.float32)
        if masks.ndim == 4:
            masks = masks[:, 0]
        d = self.masks_per_dim
        if len(masks) == 0:
            return image
        tiles = [
            cv2.resize(m, None, fx=1.0 / d, fy=1.0 / d) for m in masks[: d * d]
        ]
        th, tw = tiles[0].shape
        grid = np.zeros((d * d, th, tw), np.float32)
        grid[: len(tiles)] = np.stack(tiles)
        montage = (
            grid.reshape(d, d, th, tw).swapaxes(1, 2).reshape(d * th, d * tw)
        )
        # the heatmap-mode masker (threshold=-1) pastes 0-255 probability
        # maps; a binary-mode masker would paste {0, 1}
        if montage.max() > 1.0:
            montage = montage / 255.0
        return cv2.applyColorMap(
            np.uint8(np.clip(montage, 0, 1) * 255), cv2.COLORMAP_JET
        )

    def overlay_class_names(self, image, predictions):
        """Label text with a filled backdrop in the class color."""
        import cv2

        scores = np.asarray(predictions.get_field("scores")).tolist()
        labels = np.asarray(predictions.get_field("labels")).tolist()
        boxes = np.asarray(predictions.bbox, np.int64).tolist()
        font = cv2.FONT_HERSHEY_SIMPLEX
        for box, score, label in zip(boxes, scores, labels):
            text = "{}: {:.2f}".format(self.CATEGORIES[int(label)], score)
            (tw, th), base = cv2.getTextSize(text, font, 0.5, 1)
            x, y = box[0], max(box[1], th + base)
            cv2.rectangle(
                image, (x, y - th - base), (x + tw, y),
                self.class_color(label), -1,
            )
            cv2.putText(image, text, (x, y - base), font, 0.5, (0, 0, 0), 1)
        return image


def draw_person_skeleton(img, xy, score, color_fn, thresh=2.0, alpha=0.7):
    """Draw one COCO-person skeleton.

    xy [K, 2], score [K]: decoded keypoints; joints below `thresh` are
    skipped. Limbs take golden-wheel colors (one per connection, via
    color_fn); two synthetic segments (nose->shoulder-center and
    shoulder-center->hip-center) complete the torso. The overlay is
    alpha-blended onto the input.
    """
    import cv2

    names = PersonKeypoints.NAMES
    limbs = list(PersonKeypoints.CONNECTIONS)

    def center(a, b):
        ia, ib = names.index(a), names.index(b)
        return (xy[ia] + xy[ib]) / 2.0, min(score[ia], score[ib])

    canvas = img.copy()
    mid_sh, s_sh = center("right_shoulder", "left_shoulder")
    mid_hip, s_hip = center("right_hip", "left_hip")
    nose = names.index("nose")
    extras = [
        (mid_sh, s_sh, xy[nose], score[nose]),
        (mid_sh, s_sh, mid_hip, s_hip),
    ]
    for li, (p, sp, q, sq) in enumerate(
        [(xy[a], score[a], xy[b], score[b]) for a, b in limbs] + extras
    ):
        color = color_fn(li + 1)
        pi = tuple(int(v) for v in p)
        qi = tuple(int(v) for v in q)
        if sp > thresh and sq > thresh:
            cv2.line(canvas, pi, qi, color, 2, lineType=cv2.LINE_AA)
        if sp > thresh:
            cv2.circle(canvas, pi, 3, color, -1, lineType=cv2.LINE_AA)
        if sq > thresh:
            cv2.circle(canvas, qi, 3, color, -1, lineType=cv2.LINE_AA)
    return cv2.addWeighted(img, 1.0 - alpha, canvas, alpha, 0)
