"""Mask pasting: fixed-size mask probs -> full-image binary masks.

Reference: maskrcnn_benchmark/modeling/roi_heads/mask_head/inference.py
(expand_masks :102-116, paste_mask_in_image :119-160, Masker :163-209).
Host-side numpy/cv2 — runs at eval/demo time on final detections only.
"""

import numpy as np


def expand_boxes(boxes, scale):
    w_half = (boxes[:, 2] - boxes[:, 0]) * 0.5
    h_half = (boxes[:, 3] - boxes[:, 1]) * 0.5
    x_c = (boxes[:, 2] + boxes[:, 0]) * 0.5
    y_c = (boxes[:, 3] + boxes[:, 1]) * 0.5
    w_half *= scale
    h_half *= scale
    out = np.zeros_like(boxes)
    out[:, 0] = x_c - w_half
    out[:, 2] = x_c + w_half
    out[:, 1] = y_c - h_half
    out[:, 3] = y_c + h_half
    return out


def paste_mask_in_image(mask, box, im_h, im_w, thresh=0.5, padding=1):
    """mask: [M, M] float probs; box: xyxy in image coords."""
    import cv2

    m = mask.shape[-1]
    scale = (m + 2 * padding) / m
    padded = np.zeros((m + 2 * padding, m + 2 * padding), np.float32)
    padded[padding:-padding, padding:-padding] = mask
    box = expand_boxes(box[None], scale)[0]
    # truncate the box to ints BEFORE sizing (reference inference.py:88:
    # box = box.to(dtype=torch.int32)), so the resize target and the
    # destination slice agree even for fractional/out-of-image boxes
    box = box.astype(np.int64)

    TO_REMOVE = 1
    w = max(int(box[2] - box[0] + TO_REMOVE), 1)
    h = max(int(box[3] - box[1] + TO_REMOVE), 1)
    resized = cv2.resize(padded, (w, h), interpolation=cv2.INTER_LINEAR)
    if thresh >= 0:
        resized = (resized > thresh).astype(np.uint8)
    else:
        resized = (resized * 255).astype(np.uint8)

    im_mask = np.zeros((im_h, im_w), np.uint8)
    x_0 = max(int(box[0]), 0)
    x_1 = min(int(box[2]) + 1, im_w)
    y_0 = max(int(box[1]), 0)
    y_1 = min(int(box[3]) + 1, im_h)
    if x_1 > x_0 and y_1 > y_0:
        im_mask[y_0:y_1, x_0:x_1] = resized[
            (y_0 - int(box[1])):(y_1 - int(box[1])),
            (x_0 - int(box[0])):(x_1 - int(box[0])),
        ]
    return im_mask


class Masker:
    def __init__(self, threshold=0.5, padding=1):
        self.threshold = threshold
        self.padding = padding

    def __call__(self, masks, boxlist):
        """masks: [N, M, M] probs; boxlist: BoxList (xyxy) on the target
        image size. Returns [N, H, W] uint8."""
        im_w, im_h = boxlist.size
        boxes = boxlist.convert("xyxy").bbox
        out = np.zeros((len(boxes), im_h, im_w), np.uint8)
        for i in range(len(boxes)):
            out[i] = paste_mask_in_image(
                np.asarray(masks[i], np.float32), boxes[i], im_h, im_w,
                self.threshold, self.padding,
            )
        return out
