// Native host-side metric kernels for the tggcn framework.
//
// The evaluation protocol (F1@k over RLE segmentations, reference
// pyrutils/metrics.py:7-81) runs on the host for every example of every fold
// at every overlap threshold; this C++ implementation removes the Python/
// numpy per-segment overhead. Exposed through a C ABI consumed via ctypes
// (tggcn/utils/native.py); the numpy implementation remains the reference
// and fallback.
//
// Build: make -C native   (produces libfastmetrics.so)

#include <cstdint>
#include <vector>

extern "C" {

// Run-length encode `labels` (length n). Writes up to n entries into
// ids/starts/ends and returns the number of runs.
int64_t rle_encode(const int64_t* labels, int64_t n,
                   int64_t* ids, int64_t* starts, int64_t* ends) {
    if (n <= 0) return 0;
    int64_t num_runs = 0;
    int64_t start = 0;
    for (int64_t i = 1; i <= n; ++i) {
        if (i == n || labels[i] != labels[i - 1]) {
            ids[num_runs] = labels[start];
            starts[num_runs] = start;
            ends[num_runs] = i;
            ++num_runs;
            start = i;
        }
    }
    return num_runs;
}

// F1@overlap between one ground-truth and one predicted frame labelling.
// Semantics match the reference exactly: greedy TP assignment in temporal
// order, IoU zeroed on class mismatch, argmax ties resolved to the first
// maximum, predictions with id >= num_classes ignored, unused GT segments
// are false negatives.
double f1_at_k_single(const int64_t* y_true, const int64_t* y_pred, int64_t n,
                      int64_t num_classes, double overlap) {
    if (n <= 0) return 0.0;
    std::vector<int64_t> t_ids(n), t_starts(n), t_ends(n);
    std::vector<int64_t> o_ids(n), o_starts(n), o_ends(n);
    const int64_t nt = rle_encode(y_true, n, t_ids.data(), t_starts.data(), t_ends.data());
    const int64_t no = rle_encode(y_pred, n, o_ids.data(), o_starts.data(), o_ends.data());

    std::vector<uint8_t> used(nt, 0);
    double tp = 0.0, fp = 0.0;
    for (int64_t o = 0; o < no; ++o) {
        // argmax of IoU * (class match) over GT segments, first-max tie rule.
        double best = -1e300;
        int64_t best_idx = 0;
        for (int64_t t = 0; t < nt; ++t) {
            const double inter = static_cast<double>(
                std::min(o_ends[o], t_ends[t]) - std::max(o_starts[o], t_starts[t]));
            const double uni = static_cast<double>(
                std::max(o_ends[o], t_ends[t]) - std::min(o_starts[o], t_starts[t]));
            const double iou = (inter / uni) * (o_ids[o] == t_ids[t] ? 1.0 : 0.0);
            if (iou > best) { best = iou; best_idx = t; }
        }
        if (o_ids[o] >= num_classes) continue;
        if (best >= overlap && !used[best_idx]) {
            tp += 1.0;
            used[best_idx] = 1;
        } else {
            fp += 1.0;
        }
    }
    double fn = 0.0;
    for (int64_t t = 0; t < nt; ++t) fn += used[t] ? 0.0 : 1.0;
    const double precision = (tp + fp) > 0.0 ? tp / (tp + fp) : 0.0;
    const double recall = (tp + fn) > 0.0 ? tp / (tp + fn) : 0.0;
    return (precision + recall) > 0.0 ? 2.0 * precision * recall / (precision + recall)
                                      : 0.0;
}

// Batched F1@overlap with padding removal: frames where y_true == ignore
// are dropped per example; all-padding examples are excluded from the mean.
double f1_at_k_batch(const int64_t* y_true, const int64_t* y_pred,
                     int64_t num_examples, int64_t num_steps,
                     int64_t num_classes, double overlap, int64_t ignore_value) {
    double total = 0.0;
    double effective = 0.0;
    std::vector<int64_t> t_buf(num_steps), p_buf(num_steps);
    for (int64_t m = 0; m < num_examples; ++m) {
        const int64_t* t_row = y_true + m * num_steps;
        const int64_t* p_row = y_pred + m * num_steps;
        int64_t keep = 0;
        for (int64_t i = 0; i < num_steps; ++i) {
            if (t_row[i] != ignore_value) {
                t_buf[keep] = t_row[i];
                p_buf[keep] = p_row[i];
                ++keep;
            }
        }
        if (keep == 0) continue;
        total += f1_at_k_single(t_buf.data(), p_buf.data(), keep, num_classes, overlap);
        effective += 1.0;
    }
    return effective > 0.0 ? total / effective : 0.0;
}

}  // extern "C"
