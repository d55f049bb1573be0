"""ctypes bindings for the native mask ops (csrc/maskops.cpp).

Raises ImportError when the shared library is absent or unbuildable, in
which case maskops.py keeps its numpy fallbacks. `make -C csrc` builds it.
"""

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SO = os.path.join(_CSRC, "libmaskops.so")

if not os.path.exists(_SO):
    try:
        subprocess.run(
            ["make", "-C", _CSRC], check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, timeout=120,
        )
    except Exception as e:  # pragma: no cover
        raise ImportError("libmaskops.so not available: {}".format(e))

_lib = ctypes.CDLL(_SO)
_lib.polygons_to_mask.restype = None
_lib.run_intersection.restype = ctypes.c_int64
_lib.nms_cpu.restype = ctypes.c_int64
_lib.paste_encode_mask.restype = ctypes.c_int64


def polygons_to_mask(polygons, height, width):
    height = int(height)
    width = int(width)
    polys = [np.asarray(p, np.float64).reshape(-1) for p in polygons]
    polys = [p for p in polys if p.size >= 6]
    out = np.zeros(height * width, np.uint8)
    if not polys:
        return out.reshape(height, width)
    coords = np.ascontiguousarray(np.concatenate(polys))
    sizes = np.asarray([p.size for p in polys], np.int64)
    _lib.polygons_to_mask(
        coords.ctypes.data_as(ctypes.c_void_p),
        sizes.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(len(polys)),
        ctypes.c_int64(height),
        ctypes.c_int64(width),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out.reshape(height, width)


def run_intersection(a_counts, b_counts):
    a = np.ascontiguousarray(np.asarray(a_counts, np.int64))
    b = np.ascontiguousarray(np.asarray(b_counts, np.int64))
    return int(
        _lib.run_intersection(
            a.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(a.size),
            b.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(b.size),
        )
    )


def nms(boxes, scores, iou_threshold):
    boxes = np.ascontiguousarray(np.asarray(boxes, np.float32))
    scores = np.ascontiguousarray(np.asarray(scores, np.float32))
    n = boxes.shape[0]
    keep = np.zeros(n, np.int64)
    k = _lib.nms_cpu(
        boxes.ctypes.data_as(ctypes.c_void_p),
        scores.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(n), ctypes.c_float(iou_threshold),
        keep.ctypes.data_as(ctypes.c_void_p),
    )
    return keep[:k]


def paste_encode_mask(mask, box, im_h, im_w, thresh=0.5, padding=1):
    """Fused paste_mask_in_image + column-major RLE (native). Returns the
    int64 counts array (caller wraps into the COCO RLE dict)."""
    mask = np.ascontiguousarray(mask, np.float32)
    box = np.ascontiguousarray(box, np.float64)
    m = mask.shape[-1]
    assert mask.shape == (m, m) and box.shape == (4,)
    counts = np.empty(int(im_h) * int(im_w) + 2, np.int64)
    nc = _lib.paste_encode_mask(
        mask.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(m),
        ctypes.c_int64(int(padding)),
        box.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_double(float(thresh)),
        ctypes.c_int64(int(im_h)),
        ctypes.c_int64(int(im_w)),
        counts.ctypes.data_as(ctypes.c_void_p),
    )
    return counts[:nc]
