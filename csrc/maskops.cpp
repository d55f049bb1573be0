// Native mask operations for the host-side data pipeline and evaluation.
//
// The reference ships pycocotools' C maskApi for these (rasterization, RLE);
// pycocotools is not available here, and the Python fallbacks in
// maskrcnn_tpu/utils/maskops.py are the hot CPU path of dataset prep and
// segm evaluation. This module provides native equivalents, exposed through
// ctypes (no pybind11 in this image):
//
//   polygons_to_mask : COCO-compatible polygon rasterization (5x
//                      supersampled scanline fill incl. boundary, max-pooled
//                      back — matches the Python implementation bit-for-bit)
//   run_intersection : intersection area of two column-major RLEs
//   nms_cpu          : greedy hard NMS golden (+1 pixel convention), used by
//                      tests and host-side tooling
//
// Build: `make -C csrc` (or python setup.py build_ext) -> libmaskops.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Rasterize one instance (list of polygons, flattened xy pairs) into a
// h*w uint8 mask. coords: all polygons concatenated; sizes[i] = number of
// DOUBLES (2*points) in polygon i.
void polygons_to_mask(const double* coords, const int64_t* sizes,
                      int64_t n_polys, int64_t h, int64_t w,
                      uint8_t* out /* h*w, zeroed by caller or not */) {
  const int64_t S = 5;  // supersample factor (COCO uses 5)
  const int64_t H = h * S, W = w * S;
  std::memset(out, 0, (size_t)(h * w));
  if (n_polys <= 0) return;

  // supersampled accumulation buffer (bit per fine pixel would be leaner;
  // byte keeps the code simple and this is still ~25x the coarse mask)
  std::vector<uint8_t> fine((size_t)(H * W), 0);

  const double* p = coords;
  for (int64_t pi = 0; pi < n_polys; ++pi) {
    int64_t n = sizes[pi] / 2;  // points
    if (n >= 3) {
      // scale with COCO rounding: floor(5*v + 0.5)
      std::vector<double> xs(n), ys(n);
      for (int64_t i = 0; i < n; ++i) {
        xs[i] = std::floor(S * p[2 * i] + 0.5);
        ys[i] = std::floor(S * p[2 * i + 1] + 0.5);
      }
      // 1) scanline even-odd fill on the fine grid (pixel centers at k+0.5)
      for (int64_t y = 0; y < H; ++y) {
        double yc = y + 0.5;
        // gather x crossings
        std::vector<double> xcross;
        for (int64_t i = 0; i < n; ++i) {
          int64_t j = (i + 1) % n;
          double y0 = ys[i], y1 = ys[j];
          if ((y0 <= yc && y1 > yc) || (y1 <= yc && y0 > yc)) {
            double t = (yc - y0) / (y1 - y0);
            xcross.push_back(xs[i] + t * (xs[j] - xs[i]));
          }
        }
        std::sort(xcross.begin(), xcross.end());
        for (size_t k = 0; k + 1 < xcross.size(); k += 2) {
          int64_t x0 = (int64_t)std::ceil(xcross[k] - 0.5);
          int64_t x1 = (int64_t)std::floor(xcross[k + 1] - 0.5);
          x0 = std::max<int64_t>(x0, 0);
          x1 = std::min<int64_t>(x1, W - 1);
          for (int64_t x = x0; x <= x1; ++x) fine[(size_t)(y * W + x)] = 1;
        }
      }
      // 2) boundary: mark every fine pixel each edge passes through
      for (int64_t i = 0; i < n; ++i) {
        int64_t j = (i + 1) % n;
        double x0 = xs[i], y0 = ys[i], x1 = xs[j], y1 = ys[j];
        double dx = x1 - x0, dy = y1 - y0;
        int64_t steps = (int64_t)std::max(std::fabs(dx), std::fabs(dy)) + 1;
        for (int64_t s = 0; s <= steps; ++s) {
          double t = (double)s / (double)steps;
          int64_t xx = (int64_t)std::llround(x0 + t * dx);
          int64_t yy = (int64_t)std::llround(y0 + t * dy);
          if (xx >= 0 && xx < W && yy >= 0 && yy < H)
            fine[(size_t)(yy * W + xx)] = 1;
        }
      }
    }
    p += sizes[pi];
  }

  // 3) max-pool SxS back to the coarse grid
  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) {
      uint8_t v = 0;
      for (int64_t sy = 0; sy < S && !v; ++sy) {
        const uint8_t* row = &fine[(size_t)((y * S + sy) * W + x * S)];
        for (int64_t sx = 0; sx < S; ++sx) {
          if (row[sx]) { v = 1; break; }
        }
      }
      out[(size_t)(y * w + x)] = v;
    }
  }
}

// Intersection area of two column-major RLEs (counts arrays).
int64_t run_intersection(const int64_t* a, int64_t na, const int64_t* b,
                         int64_t nb) {
  int64_t ia = 0, ib = 0;
  int64_t ea = na > 0 ? a[0] : 0;  // end position of current a-run
  int64_t eb = nb > 0 ? b[0] : 0;
  int64_t pos = 0, inter = 0;
  int va = 0, vb = 0;
  while (ia < na && ib < nb) {
    int64_t nxt = std::min(ea, eb);
    if (va && vb) inter += nxt - pos;
    pos = nxt;
    if (ea == nxt) {
      ++ia;
      va ^= 1;
      if (ia < na) ea += a[ia];
    }
    if (eb == nxt) {
      ++ib;
      vb ^= 1;
      if (ib < nb) eb += b[ib];
    }
  }
  return inter;
}

// Greedy hard NMS, +1 pixel convention. boxes: n x 4 xyxy (already sorted
// callers pass order via `order`). Writes kept indices to `keep`, returns
// the number kept.
int64_t nms_cpu(const float* boxes, const float* scores, int64_t n,
                float iou_threshold, int64_t* keep) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return scores[a] > scores[b];
  });
  std::vector<uint8_t> suppressed((size_t)n, 0);
  std::vector<double> areas((size_t)n);
  for (int64_t i = 0; i < n; ++i) {
    areas[(size_t)i] = (double)(boxes[4 * i + 2] - boxes[4 * i] + 1) *
                       (double)(boxes[4 * i + 3] - boxes[4 * i + 1] + 1);
  }
  int64_t nkeep = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    int64_t i = order[(size_t)oi];
    if (suppressed[(size_t)i]) continue;
    keep[nkeep++] = i;
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      int64_t j = order[(size_t)oj];
      if (suppressed[(size_t)j]) continue;
      double xx1 = std::max(boxes[4 * i], boxes[4 * j]);
      double yy1 = std::max(boxes[4 * i + 1], boxes[4 * j + 1]);
      double xx2 = std::min(boxes[4 * i + 2], boxes[4 * j + 2]);
      double yy2 = std::min(boxes[4 * i + 3], boxes[4 * j + 3]);
      double iw = std::max(0.0, xx2 - xx1 + 1);
      double ih = std::max(0.0, yy2 - yy1 + 1);
      double inter = iw * ih;
      double iou = inter / (areas[(size_t)i] + areas[(size_t)j] - inter);
      if (iou > iou_threshold) suppressed[(size_t)j] = 1;
    }
  }
  return nkeep;
}

}  // extern "C"

// -- fused mask paste + column-major RLE encode ------------------------------
//
// Replaces the per-detection Python path (models/masker.py
// paste_mask_in_image + utils/maskops.py mask_to_rle_counts), which the
// reference accounts at +0.034 s/im (MODEL_ZOO.md:26) and which dominates
// end-to-end eval wall time on a small host. One call bilinearly resizes
// the padded [M, M] probability patch onto its (expanded, integerized) box,
// thresholds, and emits COCO column-major RLE counts directly — the
// [im_h, im_w] canvas is never materialized.
//
// Semantics mirror reference mask_head/inference.py:119-160: zero pad by
// `padding`, expand the box by (M+2p)/M about its center, truncate to
// int64, resize to (bw, bh) with pixel-center bilinear sampling (clamped
// borders, as cv2 INTER_LINEAR), threshold strictly, clip to the image.

static inline double sample_bilinear(const float* img, int64_t n,
                                     double sy, double sx) {
  if (sy < 0) sy = 0;
  if (sx < 0) sx = 0;
  if (sy > n - 1) sy = n - 1;
  if (sx > n - 1) sx = n - 1;
  int64_t y0 = (int64_t)sy, x0 = (int64_t)sx;
  int64_t y1 = y0 + 1 < n ? y0 + 1 : y0;
  int64_t x1 = x0 + 1 < n ? x0 + 1 : x0;
  double fy = sy - y0, fx = sx - x0;
  double v00 = img[y0 * n + x0], v01 = img[y0 * n + x1];
  double v10 = img[y1 * n + x0], v11 = img[y1 * n + x1];
  return v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
         v10 * fy * (1 - fx) + v11 * fy * fx;
}

extern "C" int64_t paste_encode_mask(
    const float* mask, int64_t m, int64_t padding, const double* box_xyxy,
    double thresh, int64_t im_h, int64_t im_w, int64_t* counts_out) {
  // padded patch
  const int64_t n = m + 2 * padding;
  std::vector<float> padded(n * n, 0.f);
  for (int64_t y = 0; y < m; ++y)
    for (int64_t x = 0; x < m; ++x)
      padded[(y + padding) * n + x + padding] = mask[y * m + x];

  // expand about center by (m+2p)/m, then truncate (numpy int64 cast)
  const double scale = (double)n / (double)m;
  double wh = (box_xyxy[2] - box_xyxy[0]) * 0.5 * scale;
  double hh = (box_xyxy[3] - box_xyxy[1]) * 0.5 * scale;
  double xc = (box_xyxy[2] + box_xyxy[0]) * 0.5;
  double yc = (box_xyxy[3] + box_xyxy[1]) * 0.5;
  const int64_t bx0 = (int64_t)(xc - wh), bx1 = (int64_t)(xc + wh);
  const int64_t by0 = (int64_t)(yc - hh), by1 = (int64_t)(yc + hh);
  int64_t bw = bx1 - bx0 + 1;  if (bw < 1) bw = 1;
  int64_t bh = by1 - by0 + 1;  if (bh < 1) bh = 1;

  // clip to the image
  int64_t x_0 = bx0 > 0 ? bx0 : 0;
  int64_t x_1 = bx1 + 1 < im_w ? bx1 + 1 : im_w;
  int64_t y_0 = by0 > 0 ? by0 : 0;
  int64_t y_1 = by1 + 1 < im_h ? by1 + 1 : im_h;

  int64_t nc = 0;          // counts written
  int64_t run = 0;         // current run length
  int cur = 0;             // current value (counts start at zeros)
  auto emit = [&](int v, int64_t len) {
    if (len == 0) return;
    if (v == cur) { run += len; return; }
    counts_out[nc++] = run;
    cur = v;
    run = len;
  };

  if (x_1 <= x_0 || y_1 <= y_0) {
    counts_out[0] = (int64_t)im_h * im_w;
    return 1;
  }

  // precomputed pixel-center row tables (y0/y1 indices + fraction) and a
  // column-factored bilinear: per destination column, interpolate the two
  // source columns along y once, then mix by fx — ~3 ops/pixel
  const double sy_scale = (double)n / (double)bh;
  const double sx_scale = (double)n / (double)bw;
  const int64_t nrows = y_1 - y_0;
  std::vector<int64_t> ry0(nrows), ry1(nrows);
  std::vector<double> rfy(nrows);
  for (int64_t y = y_0; y < y_1; ++y) {
    double sy = ((double)(y - by0) + 0.5) * sy_scale - 0.5;
    if (sy < 0) sy = 0;
    if (sy > n - 1) sy = n - 1;
    int64_t i0 = (int64_t)sy;
    ry0[y - y_0] = i0;
    ry1[y - y_0] = i0 + 1 < n ? i0 + 1 : i0;
    rfy[y - y_0] = sy - i0;
  }
  std::vector<double> ca(nrows), cb(nrows);
  const float* P = padded.data();

  emit(0, x_0 * im_h);  // leading all-zero columns
  for (int64_t x = x_0; x < x_1; ++x) {
    double sx = ((double)(x - bx0) + 0.5) * sx_scale - 0.5;
    if (sx < 0) sx = 0;
    if (sx > n - 1) sx = n - 1;
    const int64_t cx0 = (int64_t)sx;
    const int64_t cx1 = cx0 + 1 < n ? cx0 + 1 : cx0;
    const double fx = sx - cx0;
    for (int64_t r = 0; r < nrows; ++r) {
      ca[r] = P[ry0[r] * n + cx0] * (1 - rfy[r]) + P[ry1[r] * n + cx0] * rfy[r];
      cb[r] = P[ry0[r] * n + cx1] * (1 - rfy[r]) + P[ry1[r] * n + cx1] * rfy[r];
    }
    emit(0, y_0);
    for (int64_t r = 0; r < nrows; ++r) {
      const double v = ca[r] * (1 - fx) + cb[r] * fx;
      emit(v > thresh ? 1 : 0, 1);
    }
    emit(0, im_h - y_1);
  }
  emit(0, (im_w - x_1) * im_h);  // trailing all-zero columns
  counts_out[nc++] = run;
  return nc;
}
