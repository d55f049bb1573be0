"""ImageList: a padded batch of images + their true per-image sizes.

Reference: maskrcnn_benchmark/structures/image_list.py:7-72. TPU redesign:
  * layout is NHWC (TPU-native) instead of NCHW
  * `to_image_list` additionally supports padding to a fixed target shape
    (an entry from the compiled shape-bucket set) so that the train/eval
    step compiles a bounded number of programs instead of one per image size.
"""

import math

import numpy as np


class ImageList:
    def __init__(self, tensors, image_sizes):
        """tensors: [B, H, W, C] array; image_sizes: list of (h, w)."""
        self.tensors = tensors
        self.image_sizes = list(image_sizes)

    def to(self, *args, **kwargs):
        return self

    def __len__(self):
        return self.tensors.shape[0]


def to_image_list(tensors, size_divisible=0, target_shape=None):
    """Pad a list of [H, W, C] arrays into one [B, Hp, Wp, C] batch.

    Hp/Wp = max over the batch, rounded up to `size_divisible`, or the given
    static `target_shape` (h, w) when bucketing for a compiled program.
    """
    if isinstance(tensors, ImageList):
        return tensors
    if isinstance(tensors, np.ndarray) and tensors.ndim == 3:
        tensors = [tensors]
    if isinstance(tensors, np.ndarray) and tensors.ndim == 4:
        return ImageList(tensors, [t.shape[:2] for t in tensors])

    assert isinstance(tensors, (list, tuple))
    max_h = max(t.shape[0] for t in tensors)
    max_w = max(t.shape[1] for t in tensors)
    if size_divisible > 0:
        max_h = int(math.ceil(max_h / size_divisible) * size_divisible)
        max_w = int(math.ceil(max_w / size_divisible) * size_divisible)
    if target_shape is not None:
        th, tw = target_shape
        if th < max_h or tw < max_w:
            raise ValueError(
                "target_shape {} smaller than batch max {}".format(
                    target_shape, (max_h, max_w)
                )
            )
        max_h, max_w = th, tw

    c = tensors[0].shape[2]
    batch = np.zeros((len(tensors), max_h, max_w, c), dtype=tensors[0].dtype)
    sizes = []
    for i, t in enumerate(tensors):
        h, w = t.shape[:2]
        batch[i, :h, :w] = t
        sizes.append((h, w))
    return ImageList(batch, sizes)
