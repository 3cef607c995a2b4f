// Native host-side input/output pipeline kernels.
//
// 1. resize_bilinear_u8 — PIL-convention separable triangle-filter
//    resampling (support scales with the downscale factor, i.e.
//    antialiased), uint8 HWC. This is the hot op of LoadImageFromFile →
//    Resize in the data pipeline (the reference leans on cv2/C++ for it;
//    PIL's C filter is single-threaded — ours is OpenMP-parallel).
// 2. normalize_pad_f32 — fused (mean, std) normalize + top-left zero pad
//    onto the static canvas (Resize→Normalize→Pad collapse to one pass).
// 3. host_nms — greedy NMS on (n, 5) dets, exact mirror of
//    apis/test.py:_host_nms for the TTA-merge path.
#include <algorithm>
#include <cmath>
#include <cstring>
#include <numeric>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Taps {
  std::vector<int> lo;       // first source index per output index
  std::vector<int> n;        // tap count per output index
  std::vector<float> w;      // weights, stride = max tap count
  int stride = 0;
};

// PIL-style coefficient builder (triangle filter, support 1.0, scaled for
// downscale), matching Pillow's precompute_coeffs.
Taps build_taps(int in_size, int out_size) {
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 1.0 * filterscale;
  const int kmax = static_cast<int>(std::ceil(support)) * 2 + 1;
  Taps t;
  t.lo.resize(out_size);
  t.n.resize(out_size);
  t.w.assign(static_cast<size_t>(out_size) * kmax, 0.f);
  t.stride = kmax;
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    const int n = xmax - xmin;
    double total = 0.0;
    std::vector<double> k(n);
    for (int x = 0; x < n; ++x) {
      double v = (x + xmin - center + 0.5) / filterscale;
      v = v < 0 ? -v : v;
      k[x] = v < 1.0 ? 1.0 - v : 0.0;
      total += k[x];
    }
    t.lo[xx] = xmin;
    t.n[xx] = n;
    for (int x = 0; x < n; ++x)
      t.w[static_cast<size_t>(xx) * kmax + x] =
          total > 0 ? static_cast<float>(k[x] / total) : 0.f;
  }
  return t;
}

}  // namespace

extern "C" {

// src: (h, w, c) uint8 → dst: (th, tw, c) uint8.
void resize_bilinear_u8(const unsigned char* src, int h, int w, int c,
                        unsigned char* dst, int th, int tw) {
  const Taps tx = build_taps(w, tw);
  const Taps ty = build_taps(h, th);
  // horizontal pass into a float buffer (h, tw, c)
  std::vector<float> tmp(static_cast<size_t>(h) * tw * c);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int y = 0; y < h; ++y) {
    const unsigned char* row = src + static_cast<size_t>(y) * w * c;
    float* out = tmp.data() + static_cast<size_t>(y) * tw * c;
    for (int x = 0; x < tw; ++x) {
      const float* wt = tx.w.data() + static_cast<size_t>(x) * tx.stride;
      const int lo = tx.lo[x], n = tx.n[x];
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.f;
        for (int k = 0; k < n; ++k)
          acc += wt[k] * row[(lo + k) * c + ch];
        out[x * c + ch] = acc;
      }
    }
  }
  // vertical pass
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int y = 0; y < th; ++y) {
    const float* wt = ty.w.data() + static_cast<size_t>(y) * ty.stride;
    const int lo = ty.lo[y], n = ty.n[y];
    unsigned char* out = dst + static_cast<size_t>(y) * tw * c;
    for (int x = 0; x < tw * c; ++x) {
      float acc = 0.f;
      for (int k = 0; k < n; ++k)
        acc += wt[k] * tmp[static_cast<size_t>(lo + k) * tw * c + x];
      int v = static_cast<int>(acc + 0.5f);
      out[x] = static_cast<unsigned char>(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
  }
}

// src: (h, w, 3) uint8 → dst: (ph, pw, 3) float32, (x - mean) / std into
// the top-left corner, zero elsewhere.
void normalize_pad_f32(const unsigned char* src, int h, int w,
                       const float* mean, const float* stdv,
                       float* dst, int ph, int pw) {
  std::memset(dst, 0, sizeof(float) * static_cast<size_t>(ph) * pw * 3);
  const float inv[3] = {1.f / stdv[0], 1.f / stdv[1], 1.f / stdv[2]};
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int y = 0; y < h; ++y) {
    const unsigned char* row = src + static_cast<size_t>(y) * w * 3;
    float* out = dst + static_cast<size_t>(y) * pw * 3;
    for (int x = 0; x < w; ++x) {
      out[x * 3 + 0] = (row[x * 3 + 0] - mean[0]) * inv[0];
      out[x * 3 + 1] = (row[x * 3 + 1] - mean[1]) * inv[1];
      out[x * 3 + 2] = (row[x * 3 + 2] - mean[2]) * inv[2];
    }
  }
}

// dets: (n, 5); writes keep flags (original order). Mirror of
// apis/test.py:_host_nms (score-descending greedy, iou > thr suppresses).
void host_nms(const float* dets, int n, float thr, unsigned char* keep) {
  std::memset(keep, 0, n);
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int i, int j) {
    return dets[i * 5 + 4] > dets[j * 5 + 4];
  });
  std::vector<char> sup(n, 0);
  for (int oi = 0; oi < n; ++oi) {
    const int i = order[oi];
    if (sup[i]) continue;
    keep[i] = 1;
    const float* a = dets + i * 5;
    const float ai = (a[2] - a[0]) * (a[3] - a[1]);
    for (int j = 0; j < n; ++j) {
      const float* b = dets + j * 5;
      const float x1 = std::max(a[0], b[0]);
      const float y1 = std::max(a[1], b[1]);
      const float x2 = std::min(a[2], b[2]);
      const float y2 = std::min(a[3], b[3]);
      const float inter = std::max(x2 - x1, 0.f) * std::max(y2 - y1, 0.f);
      const float ab = (b[2] - b[0]) * (b[3] - b[1]);
      const float iou = inter / std::max(ab + ai - inter, 1e-9f);
      if (iou > thr) sup[j] = 1;
    }
  }
}

}  // extern "C"
