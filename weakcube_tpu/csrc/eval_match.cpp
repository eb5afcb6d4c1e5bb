// Native greedy COCO-style detection<->GT matching.
//
// Role: the pycocotools C extension the reference leans on for evaluation
// (SURVEY §2.3) — the per-(image, category, threshold) greedy assignment is
// the only Python-level hot loop left in our evaluator, so it lives here.
// Built as a plain shared library, loaded via ctypes (no pybind11 in this
// environment); evaluation/_native.py holds the wrapper + numpy fallback.
//
// Semantics mirror evaluation/omni3d_eval.py::_match_image exactly:
//   * detections visited in descending score order (caller pre-sorts);
//   * real GTs tried before ignore GTs; a det already matched to a real GT
//     never downgrades to an ignore GT;
//   * unmatched dets inherit dt_ignore (proximity / depth-band ignores).

#include <cstdint>

extern "C" {

// dt_order:   (D)      det indices in descending score order
// iou:        (D, G)   row-major IoU matrix
// gt_ignore:  (G)      0/1
// dt_ignore:  (D)      0/1
// thrs:       (T)      IoU thresholds
// out_match:  (T, D)   matched gt index or -1   (pre-allocated)
// out_ignore: (T, D)   0/1                      (pre-allocated)
void greedy_match(const int64_t* dt_order, int64_t D,
                  const double* iou, int64_t G,
                  const uint8_t* gt_ignore,
                  const uint8_t* dt_ignore,
                  const double* thrs, int64_t T,
                  int64_t* out_match, uint8_t* out_ignore) {
    // gt visit order: real GTs first, stable
    int64_t* g_order = new int64_t[G];
    {
        int64_t k = 0;
        for (int64_t g = 0; g < G; ++g) if (!gt_ignore[g]) g_order[k++] = g;
        for (int64_t g = 0; g < G; ++g) if (gt_ignore[g])  g_order[k++] = g;
    }
    uint8_t* taken = new uint8_t[G];

    for (int64_t t = 0; t < T; ++t) {
        for (int64_t g = 0; g < G; ++g) taken[g] = 0;
        const double thr_floor = thrs[t] < (1.0 - 1e-10) ? thrs[t] : (1.0 - 1e-10);
        for (int64_t oi = 0; oi < D; ++oi) {
            const int64_t d = dt_order[oi];
            int64_t best = -1;
            double best_iou = thr_floor;
            for (int64_t k = 0; k < G; ++k) {
                const int64_t g = g_order[k];
                if (taken[g] && !gt_ignore[g]) continue;
                if (best > -1 && !gt_ignore[best] && gt_ignore[g]) break;
                const double v = iou[d * G + g];
                if (v < best_iou) continue;
                best_iou = v;
                best = g;
            }
            if (best >= 0) {
                taken[best] = 1;
                out_match[t * D + d] = best;
                out_ignore[t * D + d] = gt_ignore[best];
            } else {
                out_match[t * D + d] = -1;
                out_ignore[t * D + d] = dt_ignore[d];
            }
        }
    }
    delete[] g_order;
    delete[] taken;
}

}  // extern "C"
