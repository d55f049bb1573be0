"""Mask utilities: polygon rasterization, COCO-compatible RLE codec, RLE IoU.

Replaces pycocotools' C maskApi (not available in this environment) with
a numpy implementation; the optional C++ extension in csrc/maskops (built
via setup.py) overrides the hot functions with native code when present.

The RLE string codec implements the COCO compressed format exactly
(column-major runs, delta-coded counts from index 3 on, 5-bit groups with a
continuation bit, chars offset by 48) so encoded masks are interchangeable
with pycocotools output.
"""

import numpy as np

# -- polygon rasterization -----------------------------------------------------


def polygons_to_mask(polygons, height, width):
    """Rasterize flat [x0,y0,x1,y1,...] polygon lists to a uint8 [H, W] mask.

    Matches COCO's frPoly semantics closely: COCO upsamples polygon
    coordinates 5x, rasterizes on the fine grid and downsamples; we rasterize
    with cv2.fillPoly on a 5x supersampled grid with the same rounding, which
    agrees with pycocotools on >99.9% of pixels in practice.
    """
    height = int(height)
    width = int(width)
    mask = np.zeros((height, width), dtype=np.uint8)
    if len(polygons) == 0:
        return mask
    import cv2

    pts = []
    for poly in polygons:
        p = np.asarray(poly, dtype=np.float64).reshape(-1, 2)
        if p.shape[0] < 3:
            continue
        # COCO scales by 5 and truncates: x = (int)(scale*xy[j]+.5)
        q = np.floor(5.0 * p + 0.5).astype(np.int64)
        pts.append(q.reshape(-1, 1, 2))
    if not pts:
        return mask
    big = np.zeros((height * 5, width * 5), dtype=np.uint8)
    cv2.fillPoly(big, pts, 1)
    # Downsample: COCO's frPoly marks every coarse pixel the (upsampled)
    # polygon boundary or interior touches, so a coarse pixel is set when
    # ANY of its 5x5 fine samples is set.
    mask = big.reshape(height, 5, width, 5).max(axis=(1, 3))
    return np.ascontiguousarray(mask)


# -- RLE codec -----------------------------------------------------------------


def mask_to_rle_counts(mask):
    """Dense [H, W] -> uncompressed counts (column-major runs, first run is
    zeros)."""
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    n = flat.size
    if n == 0:
        return np.zeros(0, np.int64)
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    boundaries = np.concatenate(([0], change, [n]))
    counts = np.diff(boundaries)
    if flat[0] == 1:
        counts = np.concatenate(([0], counts))
    return counts.astype(np.int64)


def rle_counts_to_mask(counts, height, width):
    counts = np.asarray(counts, np.int64)
    n = height * width
    flat = np.zeros(n, np.uint8)
    pos = np.concatenate(([0], np.cumsum(counts)))
    for i in range(1, len(counts), 2):
        flat[pos[i]:pos[i + 1]] = 1
    return flat.reshape((height, width), order="F")


def rle_counts_to_string(counts):
    """COCO compressed RLE string from counts (maskApi.c rleToString)."""
    out = []
    counts = [int(c) for c in counts]
    for i, c in enumerate(counts):
        x = c
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            ch = x & 0x1F
            x >>= 5
            more = (x != -1) if (ch & 0x10) else (x != 0)
            if more:
                ch |= 0x20
            out.append(chr(ch + 48))
    return "".join(out)


def rle_string_to_counts(s):
    """Inverse of rle_counts_to_string (maskApi.c rleFrString)."""
    if isinstance(s, bytes):
        s = s.decode("ascii")
    counts = []
    p = 0
    n = len(s)
    while p < n:
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[p]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.int64)


def encode_mask(mask):
    """Dense [H, W] -> COCO RLE dict {'size': [h, w], 'counts': str}."""
    h, w = mask.shape
    return {
        "size": [int(h), int(w)],
        "counts": rle_counts_to_string(mask_to_rle_counts(mask)),
    }


def decode_rle(rle):
    """COCO RLE dict -> dense uint8 [H, W]. Accepts compressed (str/bytes
    counts) or uncompressed (list counts) RLEs."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = rle_string_to_counts(counts)
    return rle_counts_to_mask(np.asarray(counts, np.int64), int(h), int(w))


def rle_area(rle):
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = rle_string_to_counts(counts)
    counts = np.asarray(counts, np.int64)
    return int(counts[1::2].sum())


def _run_intersection(a_counts, b_counts):
    """Intersection area of two run-length encodings (same image size)."""
    ca = np.asarray(a_counts, np.int64)
    cb = np.asarray(b_counts, np.int64)
    # positions where value flips; values start at 0
    ends_a = np.cumsum(ca)
    ends_b = np.cumsum(cb)
    ia = ib = 0
    pos = 0
    inter = 0
    va = vb = 0
    la, lb = len(ca), len(cb)
    while ia < la and ib < lb:
        na, nb = ends_a[ia], ends_b[ib]
        nxt = min(na, nb)
        if va and vb:
            inter += nxt - pos
        pos = nxt
        if na == nxt:
            ia += 1
            va ^= 1
        if nb == nxt:
            ib += 1
            vb ^= 1
    return inter


def rle_iou(dt_rles, gt_rles, iscrowd=None):
    """Pairwise IoU between two lists of RLE dicts. [D, G] float64.

    iscrowd: optional [G] flags — for crowd gt, IoU = inter / area(dt)
    (COCOeval semantics).
    """
    d, g = len(dt_rles), len(gt_rles)
    out = np.zeros((d, g), np.float64)
    dt_counts = [
        rle_string_to_counts(r["counts"])
        if isinstance(r["counts"], (str, bytes))
        else np.asarray(r["counts"], np.int64)
        for r in dt_rles
    ]
    gt_counts = [
        rle_string_to_counts(r["counts"])
        if isinstance(r["counts"], (str, bytes))
        else np.asarray(r["counts"], np.int64)
        for r in gt_rles
    ]
    dt_areas = [int(c[1::2].sum()) for c in dt_counts]
    gt_areas = [int(c[1::2].sum()) for c in gt_counts]
    for i in range(d):
        for j in range(g):
            inter = _run_intersection(dt_counts[i], gt_counts[j])
            if iscrowd is not None and iscrowd[j]:
                denom = dt_areas[i]
            else:
                denom = dt_areas[i] + gt_areas[j] - inter
            out[i, j] = inter / denom if denom > 0 else 0.0
    return out


def merge_rles(rles):
    """Union-merge a list of RLEs (used for crowd gt composition)."""
    if len(rles) == 1:
        return rles[0]
    h, w = rles[0]["size"]
    m = np.zeros((h, w), np.uint8)
    for r in rles:
        m |= decode_rle(r)
    return encode_mask(m)


def polygons_to_rle(polygons, height, width):
    return encode_mask(polygons_to_mask(polygons, height, width))


def paste_encode_mask(mask, box, im_h, im_w, thresh=0.5, padding=1):
    """Fused Masker paste + RLE encode for ONE detection: [M, M] float
    probabilities + xyxy box -> COCO RLE dict, without materializing the
    [im_h, im_w] canvas (reference accounts the per-image paste cost at
    +0.034 s/im, MODEL_ZOO.md:26). Python fallback composes the existing
    pieces; the native override runs the whole thing in one C++ pass.
    """
    from ..models.masker import paste_mask_in_image

    full = paste_mask_in_image(
        np.asarray(mask, np.float32), np.asarray(box, np.float64),
        int(im_h), int(im_w), thresh=thresh, padding=padding,
    )
    return encode_mask(full)


# Optional native override -------------------------------------------------------
try:  # pragma: no cover - exercised only when the C++ extension is built
    from . import _maskops_native  # noqa: F401

    polygons_to_mask = _maskops_native.polygons_to_mask  # noqa: F811
    _run_intersection = _maskops_native.run_intersection  # noqa: F811

    def paste_encode_mask(mask, box, im_h, im_w, thresh=0.5, padding=1):  # noqa: F811
        counts = _maskops_native.paste_encode_mask(
            mask, box, im_h, im_w, thresh=thresh, padding=padding
        )
        return {
            "size": [int(im_h), int(im_w)],
            "counts": rle_counts_to_string(counts),
        }
except ImportError:
    pass
