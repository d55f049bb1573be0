"""Host-side operations on BoxLists (numpy).

Reference: maskrcnn_benchmark/structures/boxlist_ops.py:9-129. These run at
the host/API boundary (dataset prep, evaluation, demo); the on-device
equivalents live in maskrcnn_tpu/ops (padded fixed-shape versions).
"""

import numpy as np

from ..ops.nms import nms_numpy
from .boxlist import TO_REMOVE, BoxList


def boxlist_nms(boxlist, nms_thresh, max_proposals=-1, score_field="scores"):
    if nms_thresh <= 0:
        return boxlist
    mode = boxlist.mode
    boxlist = boxlist.convert("xyxy")
    scores = boxlist.get_field(score_field)
    keep = nms_numpy(boxlist.bbox, scores, nms_thresh)
    if max_proposals > 0:
        keep = keep[:max_proposals]
    return boxlist[keep].convert(mode)


def remove_small_boxes(boxlist, min_size):
    xywh = boxlist.convert("xywh").bbox
    ws, hs = xywh[:, 2], xywh[:, 3]
    keep = (ws >= min_size) & (hs >= min_size)
    return boxlist[keep]


def boxlist_iou(boxlist1, boxlist2):
    """Pairwise IoU between two BoxLists on the same image. [N, M]."""
    if boxlist1.size != boxlist2.size:
        raise RuntimeError(
            "boxlists should have same image size, got {}, {}".format(
                boxlist1, boxlist2
            )
        )
    box1 = boxlist1.convert("xyxy").bbox
    box2 = boxlist2.convert("xyxy").bbox
    area1 = boxlist1.area()
    area2 = boxlist2.area()
    lt = np.maximum(box1[:, None, :2], box2[None, :, :2])
    rb = np.minimum(box1[:, None, 2:], box2[None, :, 2:])
    wh = np.clip(rb - lt + TO_REMOVE, 0, None)
    inter = wh[:, :, 0] * wh[:, :, 1]
    union = area1[:, None] + area2[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-10), 0.0)


def cat_boxlist(bboxes):
    """Concatenate BoxLists (same image size, mode and fields)."""
    assert isinstance(bboxes, (list, tuple))
    assert all(isinstance(b, BoxList) for b in bboxes)
    size = bboxes[0].size
    mode = bboxes[0].mode
    fields = set(bboxes[0].fields())
    assert all(b.size == size and b.mode == mode for b in bboxes)
    assert all(set(b.fields()) == fields for b in bboxes)

    out = BoxList(np.concatenate([b.bbox for b in bboxes], axis=0), size, mode)
    for field in fields:
        vals = [b.get_field(field) for b in bboxes]
        if isinstance(vals[0], np.ndarray):
            data = np.concatenate(vals, axis=0)
        else:
            data = type(vals[0]).cat(vals)
        out.add_field(field, data)
    return out
