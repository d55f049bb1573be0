"""Paired (image, target) transforms.

Reference: maskrcnn_benchmark/data/transforms/transforms.py:9-117 and
build.py:5-46. Images flow as PIL until ToArray; targets are BoxLists whose
fields transform alongside. Output is NHWC float32 numpy (TPU layout), BGR
0-255 when TO_BGR255 (Caffe2-pretrained convention).
"""

import random

import numpy as np
from PIL import Image

from ..structures.boxlist import FLIP_LEFT_RIGHT, FLIP_TOP_BOTTOM


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, image, target):
        for t in self.transforms:
            image, target = t(image, target)
        return image, target


class Resize:
    def __init__(self, min_size, max_size):
        if not isinstance(min_size, (list, tuple)):
            min_size = (min_size,)
        self.min_size = min_size
        self.max_size = max_size

    def get_size(self, image_size):
        w, h = image_size
        size = random.choice(self.min_size)
        max_size = self.max_size
        if max_size is not None:
            min_original = float(min((w, h)))
            max_original = float(max((w, h)))
            if max_original / min_original * size > max_size:
                size = int(round(max_size * min_original / max_original))
        if (w <= h and w == size) or (h <= w and h == size):
            return h, w
        if w < h:
            ow = size
            oh = int(size * h / w)
        else:
            oh = size
            ow = int(size * w / h)
        return oh, ow

    def __call__(self, image, target=None):
        oh, ow = self.get_size(image.size)
        image = image.resize((ow, oh), Image.BILINEAR)
        if target is not None:
            target = target.resize(image.size)
        return image, target


class RandomHorizontalFlip:
    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, image, target):
        if random.random() < self.prob:
            # BoxList.transpose returns a NEW object, so BOTH flip markers
            # must be re-attached or the collator's mask-patch cache keys an
            # h+v-flipped sample as v-only (corrupted cached supervision)
            h = getattr(target, "_hflipped", False)
            v = getattr(target, "_vflipped", False)
            image = image.transpose(Image.FLIP_LEFT_RIGHT)
            target = target.transpose(FLIP_LEFT_RIGHT)
            # markers consumed by the collator's mask-patch cache (the patch
            # of a flipped polygon differs from the unflipped one)
            target._hflipped = not h
            target._vflipped = v
        return image, target


class RandomVerticalFlip:
    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, image, target):
        if random.random() < self.prob:
            h = getattr(target, "_hflipped", False)
            v = getattr(target, "_vflipped", False)
            image = image.transpose(Image.FLIP_TOP_BOTTOM)
            target = target.transpose(FLIP_TOP_BOTTOM)
            target._hflipped = h
            target._vflipped = not v
        return image, target


class ColorJitter:
    def __init__(self, brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    def __call__(self, image, target):
        from PIL import ImageEnhance

        if self.brightness > 0:
            f = 1 + random.uniform(-self.brightness, self.brightness)
            image = ImageEnhance.Brightness(image).enhance(f)
        if self.contrast > 0:
            f = 1 + random.uniform(-self.contrast, self.contrast)
            image = ImageEnhance.Contrast(image).enhance(f)
        if self.saturation > 0:
            f = 1 + random.uniform(-self.saturation, self.saturation)
            image = ImageEnhance.Color(image).enhance(f)
        if self.hue > 0:
            h = random.uniform(-self.hue, self.hue)
            hsv = np.array(image.convert("HSV"), np.uint8)
            hsv[..., 0] = (hsv[..., 0].astype(np.int16) + int(h * 255)) % 255
            image = Image.fromarray(hsv, "HSV").convert("RGB")
        return image, target


class ToArray:
    """PIL -> HWC numpy RGB. Kept as uint8: Normalize consumes uint8 via a
    fused lookup table, making float32 materialize exactly once per image
    (the loader is host-CPU bound, SURVEY.md hard part #6)."""

    def __call__(self, image, target):
        if isinstance(image, np.ndarray):
            if image.dtype == np.uint8:
                return image, target
            return np.asarray(image, np.float32), target
        return np.asarray(image, np.uint8), target


class Normalize:
    def __init__(self, mean, std, to_bgr255=True, uint8_passthrough=False):
        """uint8_passthrough: leave uint8 images untouched (the model
        normalizes them on device, TPU.DEVICE_NORMALIZE) but still
        normalize float inputs, which the device path would otherwise
        assume were already normalized on host."""
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_bgr255 = to_bgr255
        self.uint8_passthrough = uint8_passthrough
        # per-output-channel LUT over the 256 uint8 values: one fused
        # gather-pass replaces flip + subtract + divide full-image passes
        v = np.arange(256, dtype=np.float32)
        scaled = v if to_bgr255 else v / 255.0
        self._lut = np.stack(
            [(scaled - self.mean[c]) / self.std[c] for c in range(len(self.mean))]
        )  # [C, 256]
        self._src = (
            np.arange(len(self.mean))[::-1] if to_bgr255
            else np.arange(len(self.mean))
        )

    def __call__(self, image, target):
        if image.dtype == np.uint8 and image.ndim == 3:
            if self.uint8_passthrough:
                return image, target
            out = np.empty(image.shape[:2] + (len(self._src),), np.float32)
            for c, sc in enumerate(self._src):
                out[:, :, c] = self._lut[c][image[:, :, sc]]
            return out, target
        # float fallback (synthetic arrays fed directly to the transform)
        if self.to_bgr255:
            image = image[:, :, ::-1]  # RGB -> BGR, stays 0-255
        else:
            image = image / 255.0
        image = (image - self.mean) / self.std
        return np.ascontiguousarray(image, np.float32), target


def build_transforms(cfg, is_train=True):
    if is_train:
        min_size = cfg.INPUT.MIN_SIZE_TRAIN
        max_size = cfg.INPUT.MAX_SIZE_TRAIN
        flip_h = cfg.INPUT.HORIZONTAL_FLIP_PROB_TRAIN
        flip_v = cfg.INPUT.VERTICAL_FLIP_PROB_TRAIN
        brightness = cfg.INPUT.BRIGHTNESS
        contrast = cfg.INPUT.CONTRAST
        saturation = cfg.INPUT.SATURATION
        hue = cfg.INPUT.HUE
    else:
        min_size = cfg.INPUT.MIN_SIZE_TEST
        max_size = cfg.INPUT.MAX_SIZE_TEST
        flip_h = flip_v = 0.0
        brightness = contrast = saturation = hue = 0.0

    ts = []
    if is_train and any((brightness, contrast, saturation, hue)):
        ts.append(ColorJitter(brightness, contrast, saturation, hue))
    ts.append(Resize(min_size, max_size))
    if flip_h > 0:
        ts.append(RandomHorizontalFlip(flip_h))
    if flip_v > 0:
        ts.append(RandomVerticalFlip(flip_v))
    ts.append(ToArray())
    # With TPU.DEVICE_NORMALIZE, uint8 images stay raw RGB through the
    # collator and the wire (the model applies the identical normalization
    # on device, detector.py:_prepare_images) — but float inputs must still
    # be normalized here, since the device path passes float32 through on
    # the assumption it was host-normalized.
    ts.append(
        Normalize(
            cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD, cfg.INPUT.TO_BGR255,
            uint8_passthrough=cfg.TPU.DEVICE_NORMALIZE,
        )
    )
    return Compose(ts)
