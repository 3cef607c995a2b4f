// Greedy TP/FP matching for detection evaluation.
//
// Native counterpart of core/eval/mean_ap.py:tpfp_default — the host-side
// hot loop of VOC/COCO evaluation (the reference offloads this to a
// multiprocessing pool of python workers; here it is one C++ kernel).
// Exposed via ctypes (utils/native.py); python fallback kept for parity
// testing.
#include <algorithm>
#include <cmath>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

inline float iou(const float* a, const float* b, float extra) {
  const float ix1 = std::max(a[0], b[0]);
  const float iy1 = std::max(a[1], b[1]);
  const float ix2 = std::min(a[2], b[2]);
  const float iy2 = std::min(a[3], b[3]);
  const float iw = std::max(ix2 - ix1 + extra, 0.f);
  const float ih = std::max(iy2 - iy1 + extra, 0.f);
  const float inter = iw * ih;
  const float area_a = (a[2] - a[0] + extra) * (a[3] - a[1] + extra);
  const float area_b = (b[2] - b[0] + extra) * (b[3] - b[1] + extra);
  const float uni = area_a + area_b - inter;
  return uni > 0.f ? inter / uni : 0.f;
}

}  // namespace

extern "C" {

// dets: (n_det, 5) [x1 y1 x2 y2 score] row-major; gts: (n_gt, 4);
// ignores: (n_ig, 4). Writes tp/fp as 0/1 bytes per det (original order).
void tpfp_greedy(const float* dets, int n_det, const float* gts, int n_gt,
                 const float* ignores, int n_ig, float iou_thr, float extra,
                 unsigned char* tp, unsigned char* fp) {
  std::memset(tp, 0, n_det);
  std::memset(fp, 0, n_det);
  if (n_det == 0) return;
  if (n_gt == 0 && n_ig == 0) {
    std::memset(fp, 1, n_det);
    return;
  }
  std::vector<int> order(n_det);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int i, int j) {
    return dets[i * 5 + 4] > dets[j * 5 + 4];
  });
  std::vector<char> covered(n_gt, 0);
  for (int oi = 0; oi < n_det; ++oi) {
    const int i = order[oi];
    const float* d = dets + i * 5;
    float best = 0.f;
    int best_j = -1;
    for (int j = 0; j < n_gt; ++j) {
      const float v = iou(d, gts + j * 4, extra);
      if (v > best) { best = v; best_j = j; }
    }
    if (n_gt > 0 && best >= iou_thr) {
      if (!covered[best_j]) { covered[best_j] = 1; tp[i] = 1; }
      else fp[i] = 1;
      continue;
    }
    bool ignored = false;
    for (int j = 0; j < n_ig; ++j) {
      if (iou(d, ignores + j * 4, extra) >= iou_thr) { ignored = true; break; }
    }
    if (!ignored) fp[i] = 1;
  }
}

}  // extern "C"
