// Native host-side kernels for OrienMask-TPU.
//
// The reference implements NMS as C++/CUDA torch extensions (eval/src/); on TPU
// the hot NMS path lives inside XLA (ops/nms.py), so the native tier here covers
// the *host-side* hot loops instead:
//   - om_nms:           greedy CPU NMS (reference-parity fallback / tests)
//   - om_rle_encode:    COCO compressed-RLE mask encoding (the eval-time hot op:
//                       thousands of 544x544 masks per COCO run)
//   - om_resize_*:      bilinear/nearest image resize for the data loader
//
// Exposed with a plain C ABI and bound via ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Greedy NMS over score-sorted cxcywh+score boxes. Returns number kept; keep
// indices (input order, ascending) written to keep_out.
int om_nms(const float* dets, int n, float thresh, int64_t* keep_out) {
  if (n <= 0) return 0;
  std::vector<float> x1(n), y1(n), x2(n), y2(n), area(n);
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) {
    const float* d = dets + 5 * i;
    x1[i] = d[0] - d[2] / 2.f;
    y1[i] = d[1] - d[3] / 2.f;
    x2[i] = d[0] + d[2] / 2.f;
    y2[i] = d[1] + d[3] / 2.f;
    area[i] = (x2[i] - x1[i]) * (y2[i] - y1[i]);
    order[i] = i;
  }
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return dets[5 * a + 4] > dets[5 * b + 4]; });
  std::vector<uint8_t> suppressed(n, 0);
  for (int oi = 0; oi < n; ++oi) {
    int i = order[oi];
    if (suppressed[i]) continue;
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (suppressed[j]) continue;
      float xx1 = std::max(x1[i], x1[j]);
      float yy1 = std::max(y1[i], y1[j]);
      float xx2 = std::min(x2[i], x2[j]);
      float yy2 = std::min(y2[i], y2[j]);
      float w = std::max(0.f, xx2 - xx1);
      float h = std::max(0.f, yy2 - yy1);
      float inter = w * h;
      float ovr = inter / (area[i] + area[j] - inter);
      if (ovr >= thresh) suppressed[j] = 1;
    }
  }
  int m = 0;
  for (int i = 0; i < n; ++i)
    if (!suppressed[i]) keep_out[m++] = i;
  return m;
}

// COCO compressed RLE: column-major runs, counts[0] is the zero-run, base-32
// varint chars with delta coding from index 3 on (pycocotools wire format).
// mask is row-major HxW uint8. Returns string length, or -1 if out_cap too small.
int om_rle_encode(const uint8_t* mask, int h, int w, char* out, int out_cap) {
  std::vector<int64_t> counts;
  counts.reserve(256);
  int64_t run = 0;
  uint8_t val = 0;
  for (int x = 0; x < w; ++x) {
    const uint8_t* col = mask + x;  // stride w between rows
    for (int y = 0; y < h; ++y) {
      uint8_t v = col[(size_t)y * w] != 0;
      if (v == val) {
        ++run;
      } else {
        counts.push_back(run);
        run = 1;
        val = v;
      }
    }
  }
  counts.push_back(run);
  int p = 0;
  const int m = (int)counts.size();
  for (int i = 0; i < m; ++i) {
    int64_t x = counts[i];
    if (i > 2) x -= counts[i - 2];
    bool more = true;
    while (more) {
      int c = (int)(x & 0x1f);
      x >>= 5;
      more = (c & 0x10) ? (x != -1) : (x != 0);
      if (more) c |= 0x20;
      if (p >= out_cap) return -1;
      out[p++] = (char)(c + 48);
    }
  }
  return p;
}

// Batch RLE encode: n masks (n, h, w) uint8; writes concatenated strings to out
// and per-mask lengths to lens. Returns total length or -1 on overflow.
int om_rle_encode_batch(const uint8_t* masks, int n, int h, int w, char* out,
                        int out_cap, int32_t* lens) {
  int total = 0;
  for (int i = 0; i < n; ++i) {
    int len = om_rle_encode(masks + (size_t)i * h * w, h, w, out + total,
                            out_cap - total);
    if (len < 0) return -1;
    lens[i] = len;
    total += len;
  }
  return total;
}

// Bilinear resize float32 HWC, half-pixel centers (align_corners=false matches
// torch/cv2 INTER_LINEAR).
void om_resize_bilinear(const float* src, int sh, int sw, int c, float* dst,
                        int dh, int dw, int align_corners) {
  for (int y = 0; y < dh; ++y) {
    float fy = align_corners && dh > 1
                   ? (float)y * (sh - 1) / (dh - 1)
                   : ((float)y + 0.5f) * sh / dh - 0.5f;
    fy = std::min(std::max(fy, 0.f), (float)(sh - 1));
    int y0 = (int)fy;
    int y1 = std::min(y0 + 1, sh - 1);
    float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = align_corners && dw > 1
                     ? (float)x * (sw - 1) / (dw - 1)
                     : ((float)x + 0.5f) * sw / dw - 0.5f;
      fx = std::min(std::max(fx, 0.f), (float)(sw - 1));
      int x0 = (int)fx;
      int x1 = std::min(x0 + 1, sw - 1);
      float wx = fx - x0;
      const float* p00 = src + ((size_t)y0 * sw + x0) * c;
      const float* p01 = src + ((size_t)y0 * sw + x1) * c;
      const float* p10 = src + ((size_t)y1 * sw + x0) * c;
      const float* p11 = src + ((size_t)y1 * sw + x1) * c;
      float* o = dst + ((size_t)y * dw + x) * c;
      for (int k = 0; k < c; ++k) {
        float top = p00[k] * (1 - wx) + p01[k] * wx;
        float bot = p10[k] * (1 - wx) + p11[k] * wx;
        o[k] = top * (1 - wy) + bot * wy;
      }
    }
  }
}

void om_resize_nearest(const uint8_t* src, int sh, int sw, int c, uint8_t* dst,
                       int dh, int dw) {
  for (int y = 0; y < dh; ++y) {
    int sy = std::min((int)((float)y * sh / dh), sh - 1);
    for (int x = 0; x < dw; ++x) {
      int sx = std::min((int)((float)x * sw / dw), sw - 1);
      std::memcpy(dst + ((size_t)y * dw + x) * c,
                  src + ((size_t)sy * sw + sx) * c, c);
    }
  }
}

}  // extern "C"
