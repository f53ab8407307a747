// Native host-side NMS for vps_tpu eval tooling.
//
// Role parity with the reference's host NMS stack
// (/root/reference/mmdet/models/utils/upsnet/nms/cpu_nms.pyx and
// mmdet/ops/nms/src/nms_cpu.cpp — both greedy hard NMS, plus
// mmdet/ops/nms/src/soft_nms_cpu.pyx): used on the host side of eval
// pipelines where detections already live in numpy. The device path uses
// the XLA masked-NMS in vps_tpu/ops/nms.py; this exists so host tools never
// round-trip through the accelerator.
//
// Exposed C ABI (ctypes):
//   int cpu_nms(const float* dets, int n, float thresh, int* keep);
//       dets rows: (x1, y1, x2, y2, score), pre-sorted or not (sorts
//       internally, descending score). Returns number of kept boxes; their
//       original indices land in keep[0..ret).
//   int cpu_soft_nms(float* dets, int n, float iou_thr, float sigma,
//                    float min_score, int method, int* keep);
//       method: 0 = hard, 1 = linear, 2 = gaussian. Rescores in place
//       (score column mutated); returns kept count.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <numeric>
#include <vector>

namespace {
inline float iou_p1(const float* a, const float* b) {
    float iw = std::min(a[2], b[2]) - std::max(a[0], b[0]) + 1.0f;
    if (iw <= 0) return 0.0f;
    float ih = std::min(a[3], b[3]) - std::max(a[1], b[1]) + 1.0f;
    if (ih <= 0) return 0.0f;
    float sa = (a[2] - a[0] + 1.0f) * (a[3] - a[1] + 1.0f);
    float sb = (b[2] - b[0] + 1.0f) * (b[3] - b[1] + 1.0f);
    return iw * ih / (sa + sb - iw * ih);
}
}  // namespace

extern "C" {

int cpu_nms(const float* dets, int n, float thresh, int* keep) {
    std::vector<int> order(n);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(), [&](int i, int j) {
        return dets[i * 5 + 4] > dets[j * 5 + 4];
    });
    std::vector<char> suppressed(n, 0);
    int nkeep = 0;
    for (int oi = 0; oi < n; oi++) {
        int i = order[oi];
        if (suppressed[i]) continue;
        keep[nkeep++] = i;
        for (int oj = oi + 1; oj < n; oj++) {
            int j = order[oj];
            if (suppressed[j]) continue;
            if (iou_p1(dets + i * 5, dets + j * 5) > thresh) suppressed[j] = 1;
        }
    }
    return nkeep;
}

int cpu_soft_nms(float* dets, int n, float iou_thr, float sigma,
                 float min_score, int method, int* keep) {
    // Greedy: repeatedly take the max-score box, decay overlaps.
    std::vector<char> done(n, 0);
    int nkeep = 0;
    for (int it = 0; it < n; it++) {
        int best = -1;
        float best_s = min_score;
        for (int i = 0; i < n; i++) {
            if (!done[i] && dets[i * 5 + 4] > best_s) {
                best_s = dets[i * 5 + 4];
                best = i;
            }
        }
        if (best < 0) break;
        done[best] = 1;
        keep[nkeep++] = best;
        for (int j = 0; j < n; j++) {
            if (done[j]) continue;
            float ov = iou_p1(dets + best * 5, dets + j * 5);
            float w = 1.0f;
            if (method == 1) {  // linear
                if (ov > iou_thr) w = 1.0f - ov;
            } else if (method == 2) {  // gaussian
                w = std::exp(-(ov * ov) / sigma);
            } else {  // hard
                if (ov > iou_thr) w = 0.0f;
            }
            dets[j * 5 + 4] *= w;
        }
    }
    return nkeep;
}

}  // extern "C"
