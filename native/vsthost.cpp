// vsthost — native host-side runtime for vae_song_tpu.
//
// The TPU owns all model compute (XLA/Pallas); this library owns the
// host-side hot paths that would otherwise run as Python loops on a
// single-core host:
//   * batched point-cloud resampling (ShapeNet materialize),
//   * shuffled batch assembly (gather rows into contiguous batches),
//   * a CPU Chamfer distance used as an oracle in tests.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this
// image). Build: `make -C native` -> libvsthost.so.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <random>

extern "C" {

// Resample `num_clouds` point clouds, each with counts[i] points of
// `dim` floats located at offsets[i] (in points) inside `in`, to
// exactly `target` points each, written contiguously to `out`
// [num_clouds, target, dim].
// Matches dataset.py:668-677: subsample without replacement when
// count > target; pad by random repetition when count < target.
void resample_point_clouds(const float* in, const int64_t* offsets,
                           const int64_t* counts, int64_t num_clouds,
                           int64_t dim, int64_t target, uint64_t seed,
                           float* out) {
    std::mt19937_64 rng(seed);
    std::vector<int64_t> idx;
    for (int64_t c = 0; c < num_clouds; ++c) {
        const float* src = in + offsets[c] * dim;
        float* dst = out + c * target * dim;
        int64_t n = counts[c];
        if (n == target) {
            std::memcpy(dst, src, sizeof(float) * target * dim);
            continue;
        }
        if (n > target) {
            // partial Fisher-Yates: first `target` of a random permutation
            idx.resize(n);
            for (int64_t i = 0; i < n; ++i) idx[i] = i;
            for (int64_t i = 0; i < target; ++i) {
                std::uniform_int_distribution<int64_t> d(i, n - 1);
                std::swap(idx[i], idx[d(rng)]);
                std::memcpy(dst + i * dim, src + idx[i] * dim, sizeof(float) * dim);
            }
        } else {
            std::memcpy(dst, src, sizeof(float) * n * dim);
            std::uniform_int_distribution<int64_t> d(0, n - 1);
            for (int64_t i = n; i < target; ++i) {
                std::memcpy(dst + i * dim, src + d(rng) * dim, sizeof(float) * dim);
            }
        }
    }
}

// Gather rows: out[i] = data[perm[i]] for i in [0, num_rows).
// data rows are `row_elems` floats.
void shuffled_gather(const float* data, const int64_t* perm,
                     int64_t num_rows, int64_t row_elems, float* out) {
    for (int64_t i = 0; i < num_rows; ++i) {
        std::memcpy(out + i * row_elems, data + perm[i] * row_elems,
                    sizeof(float) * row_elems);
    }
}

// Fisher-Yates permutation of [0, n) into perm.
void make_permutation(int64_t n, uint64_t seed, int64_t* perm) {
    for (int64_t i = 0; i < n; ++i) perm[i] = i;
    std::mt19937_64 rng(seed);
    for (int64_t i = n - 1; i > 0; --i) {
        std::uniform_int_distribution<int64_t> d(0, i);
        std::swap(perm[i], perm[d(rng)]);
    }
}

// Symmetric squared Chamfer distance over a batch:
// pred [b, np, 3], gt [b, ng, 3] -> scalar (model.py:896-912 semantics).
double chamfer_cpu(const float* pred, const float* gt, int64_t b,
                   int64_t np_, int64_t ng) {
    double total = 0.0;
    for (int64_t k = 0; k < b; ++k) {
        const float* p = pred + k * np_ * 3;
        const float* g = gt + k * ng * 3;
        double sum_p = 0.0, sum_g = 0.0;
        for (int64_t i = 0; i < np_; ++i) {
            float best = INFINITY;
            for (int64_t j = 0; j < ng; ++j) {
                float dx = p[i * 3] - g[j * 3];
                float dy = p[i * 3 + 1] - g[j * 3 + 1];
                float dz = p[i * 3 + 2] - g[j * 3 + 2];
                float d = dx * dx + dy * dy + dz * dz;
                best = std::min(best, d);
            }
            sum_p += best;
        }
        for (int64_t j = 0; j < ng; ++j) {
            float best = INFINITY;
            for (int64_t i = 0; i < np_; ++i) {
                float dx = p[i * 3] - g[j * 3];
                float dy = p[i * 3 + 1] - g[j * 3 + 1];
                float dz = p[i * 3 + 2] - g[j * 3 + 2];
                float d = dx * dx + dy * dy + dz * dz;
                best = std::min(best, d);
            }
            sum_g += best;
        }
        total += sum_p / double(np_) + sum_g / double(ng);
    }
    return total / double(b);
}

}  // extern "C"
