// Native host ops for the data pipeline.
//
// The reference spends its host preprocessing time in two native
// third-party deps: a numpy FPS loop (dataset/KittiDataset.py:107-126) and
// scipy's cKDTree 1-NN query (dataset/KittiDataset.py:363-367). These are
// the same two ops, implemented directly: FPS is the standard min-distance
// recurrence; the 1-NN assignment is a blocked brute-force scan (for
// N=40960 x M=1280 the brute force beats tree construction + query).
//
// Exposed as a plain C ABI for ctypes binding (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <limits>

extern "C" {

// Farthest point sampling.
//  pts:  [n, 3] float32 row-major
//  out_idx: [k] int64 (out_idx[0] must be pre-set to the initial index)
void cmr_fps(const float* pts, int64_t n, int64_t k, int64_t* out_idx,
             float* dist_scratch) {
    const int64_t init = out_idx[0];
    const float ix = pts[init * 3 + 0];
    const float iy = pts[init * 3 + 1];
    const float iz = pts[init * 3 + 2];
    for (int64_t i = 0; i < n; ++i) {
        const float dx = pts[i * 3 + 0] - ix;
        const float dy = pts[i * 3 + 1] - iy;
        const float dz = pts[i * 3 + 2] - iz;
        dist_scratch[i] = dx * dx + dy * dy + dz * dz;
    }
    for (int64_t s = 1; s < k; ++s) {
        int64_t far = 0;
        float best = -1.0f;
        for (int64_t i = 0; i < n; ++i) {
            if (dist_scratch[i] > best) {
                best = dist_scratch[i];
                far = i;
            }
        }
        out_idx[s] = far;
        const float fx = pts[far * 3 + 0];
        const float fy = pts[far * 3 + 1];
        const float fz = pts[far * 3 + 2];
        for (int64_t i = 0; i < n; ++i) {
            const float dx = pts[i * 3 + 0] - fx;
            const float dy = pts[i * 3 + 1] - fy;
            const float dz = pts[i * 3 + 2] - fz;
            const float d = dx * dx + dy * dy + dz * dz;
            if (d < dist_scratch[i]) dist_scratch[i] = d;
        }
    }
}

// Brute-force 1-NN assignment: points [n,3] -> nearest of centers [m,3].
void cmr_nn_assign(const float* points, int64_t n, const float* centers,
                   int64_t m, int64_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const float px = points[i * 3 + 0];
        const float py = points[i * 3 + 1];
        const float pz = points[i * 3 + 2];
        float best = std::numeric_limits<float>::max();
        int64_t best_j = 0;
        for (int64_t j = 0; j < m; ++j) {
            const float dx = centers[j * 3 + 0] - px;
            const float dy = centers[j * 3 + 1] - py;
            const float dz = centers[j * 3 + 2] - pz;
            const float d = dx * dx + dy * dy + dz * dz;
            if (d < best) {
                best = d;
                best_j = j;
            }
        }
        out[i] = best_j;
    }
}

}  // extern "C"
