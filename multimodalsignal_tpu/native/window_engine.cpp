// Host-side data engine: sliding-window gather + per-subject normalization.
//
// The reference's data path is pure Python (SURVEY.md §2: no native
// components exist upstream); this is the rebuild's native tier for the
// host-bound stages that feed the TPU — the O(N*W*C) window gather and the
// per-channel z-score, both memory-bandwidth-bound and trivially parallel
// across windows/channels. Compiled with plain g++ (no pybind11 dependency),
// loaded via ctypes (multimodalsignal_tpu/native/__init__.py), with the
// NumPy implementations as behavioral reference and fallback.
//
// Build: g++ -O3 -march=native -shared -fPIC -fopenmp (openmp optional)
//        window_engine.cpp -o libwindow_engine.so

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Gather N windows of length W from a [T, C] float32 signal into [N, W, C].
// starts are row indices into the signal; caller guarantees bounds.
void sliding_windows_f32(const float* signal, int64_t t_total, int64_t channels,
                         const int64_t* starts, int64_t num_windows,
                         int64_t window, float* out) {
    (void)t_total;
    const int64_t row_bytes = channels * static_cast<int64_t>(sizeof(float));
#pragma omp parallel for schedule(static)
    for (int64_t n = 0; n < num_windows; ++n) {
        const float* src = signal + starts[n] * channels;
        float* dst = out + n * window * channels;
        std::memcpy(dst, src, static_cast<size_t>(window * row_bytes));
    }
}

// In-place per-channel z-score of [N, W, C] windows:
//   out[..., c] = ((log1p?)(x[..., c]) - mean[c]) / std[c]
// log1p_mask[c] != 0 applies log1p before standardizing (the reference's
// chest_EDA transform, dataset.py:40-44).
void normalize_windows_f32(float* windows, int64_t num_windows, int64_t window,
                           int64_t channels, const double* mean,
                           const double* std, const uint8_t* log1p_mask) {
    const int64_t rows = num_windows * window;
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < rows; ++r) {
        float* row = windows + r * channels;
        for (int64_t c = 0; c < channels; ++c) {
            double v = static_cast<double>(row[c]);
            if (log1p_mask[c]) v = std::log1p(v);
            row[c] = static_cast<float>((v - mean[c]) / std[c]);
        }
    }
}

// Channel statistics over selected windows of a [N, W, C] array:
// for each channel, mean and (population) std of x or log1p(x).
void channel_stats_f32(const float* windows, int64_t num_windows,
                       int64_t window, int64_t channels,
                       const uint8_t* log1p_mask, double* mean_out,
                       double* std_out) {
    const int64_t rows = num_windows * window;
    for (int64_t c = 0; c < channels; ++c) {
        double s = 0.0, s2 = 0.0;
#pragma omp parallel for reduction(+ : s, s2) schedule(static)
        for (int64_t r = 0; r < rows; ++r) {
            double v = static_cast<double>(windows[r * channels + c]);
            if (log1p_mask[c]) v = std::log1p(v);
            s += v;
            s2 += v * v;
        }
        const double m = s / static_cast<double>(rows);
        double var = s2 / static_cast<double>(rows) - m * m;
        if (var < 0.0) var = 0.0;
        mean_out[c] = m;
        std_out[c] = std::sqrt(var);
    }
}

}  // extern "C"
