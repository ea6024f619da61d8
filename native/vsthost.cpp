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
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

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

// ---------------------------------------------------------------------------
// Threaded prefetch batch loader — the native equivalent of the
// reference's DataLoader(num_workers=8, pin_memory, drop_last)
// (main.py:182-197): worker threads assemble shuffled contiguous
// batches into a bounded ring of slots ahead of the consumer, so batch
// gather/copy overlaps the TPU dispatch on the main thread.
//
// Rows are opaque bytes (X float images / point clouds, Y any label
// dtype). The loader BORROWS the dataset pointers — the Python wrapper
// keeps the arrays alive for the loader's lifetime.
// ---------------------------------------------------------------------------

namespace {

struct Loader {
    const uint8_t* X;
    const uint8_t* Y;
    int64_t x_row = 0, y_row = 0;   // bytes per row
    int64_t batch = 0, n_batches = 0;
    int64_t depth = 0;
    std::vector<int64_t> perm;

    std::vector<std::vector<uint8_t>> slot_x, slot_y;
    std::vector<int64_t> slot_tag;   // batch index + 1 stored in slot, 0 = empty
    std::atomic<int64_t> next_job{0};
    int64_t consumed = 0;            // guarded by m
    std::mutex m;
    std::condition_variable cv_full, cv_free;
    bool stopping = false;
    std::vector<std::thread> workers;

    void fill(int64_t b) {
        const int64_t s = b % depth;
        uint8_t* dx = slot_x[s].data();
        uint8_t* dy = slot_y[s].data();
        const int64_t* p = perm.data() + b * batch;
        for (int64_t i = 0; i < batch; ++i) {
            std::memcpy(dx + i * x_row, X + p[i] * x_row, x_row);
            if (y_row) std::memcpy(dy + i * y_row, Y + p[i] * y_row, y_row);
        }
    }

    void worker() {
        for (;;) {
            const int64_t b = next_job.fetch_add(1);
            if (b >= n_batches) return;
            {
                // wait until the ring slot for batch b is free
                std::unique_lock<std::mutex> lk(m);
                cv_free.wait(lk, [&] { return stopping || b - consumed < depth; });
                if (stopping) return;
            }
            fill(b);
            {
                std::lock_guard<std::mutex> lk(m);
                slot_tag[b % depth] = b + 1;
            }
            cv_full.notify_all();
        }
    }
};

}  // namespace

extern "C" {

void* loader_create(const uint8_t* X, const uint8_t* Y, int64_t n,
                    int64_t x_row_bytes, int64_t y_row_bytes,
                    int64_t batch, int drop_last, int shuffle,
                    uint64_t seed, int64_t n_workers, int64_t depth) {
    auto* L = new Loader();
    L->X = X;
    L->Y = Y;
    L->x_row = x_row_bytes;
    L->y_row = Y ? y_row_bytes : 0;
    L->batch = batch;
    L->n_batches = drop_last ? n / batch : (n + batch - 1) / batch;
    // a short final batch would change the row count per slot; the
    // framework (like the reference) trains drop_last, so refuse ragged
    if (!drop_last && n % batch != 0) L->n_batches = n / batch;
    L->depth = std::max<int64_t>(1, depth);

    L->perm.resize(L->n_batches * batch);
    std::vector<int64_t> order(n);
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    if (shuffle) {
        std::mt19937_64 rng(seed);
        for (int64_t i = n - 1; i > 0; --i) {
            std::uniform_int_distribution<int64_t> d(0, i);
            std::swap(order[i], order[d(rng)]);
        }
    }
    std::memcpy(L->perm.data(), order.data(),
                sizeof(int64_t) * L->n_batches * batch);

    L->slot_x.resize(L->depth);
    L->slot_y.resize(L->depth);
    L->slot_tag.assign(L->depth, 0);
    for (int64_t s = 0; s < L->depth; ++s) {
        L->slot_x[s].resize(batch * x_row_bytes);
        L->slot_y[s].resize(L->y_row ? batch * L->y_row : 1);
    }
    const int64_t nw = std::max<int64_t>(1, n_workers);
    for (int64_t w = 0; w < nw; ++w)
        L->workers.emplace_back(&Loader::worker, L);
    return L;
}

int64_t loader_num_batches(void* h) {
    return static_cast<Loader*>(h)->n_batches;
}

// Copy the next batch into caller buffers. Returns 1, or 0 when the
// epoch is exhausted.
int loader_next(void* h, uint8_t* out_x, uint8_t* out_y) {
    auto* L = static_cast<Loader*>(h);
    int64_t b;
    {
        std::unique_lock<std::mutex> lk(L->m);
        b = L->consumed;
        if (b >= L->n_batches) return 0;
        L->cv_full.wait(lk, [&] { return L->slot_tag[b % L->depth] == b + 1; });
    }
    std::memcpy(out_x, L->slot_x[b % L->depth].data(), L->batch * L->x_row);
    if (L->y_row && out_y)
        std::memcpy(out_y, L->slot_y[b % L->depth].data(), L->batch * L->y_row);
    {
        std::lock_guard<std::mutex> lk(L->m);
        L->slot_tag[b % L->depth] = 0;
        L->consumed = b + 1;
    }
    L->cv_free.notify_all();
    return 1;
}

void loader_destroy(void* h) {
    auto* L = static_cast<Loader*>(h);
    {
        std::lock_guard<std::mutex> lk(L->m);
        L->stopping = true;
        L->next_job.store(L->n_batches);
        // unblock any worker waiting on a full ring
        L->consumed = L->n_batches;
    }
    L->cv_free.notify_all();
    for (auto& t : L->workers) t.join();
    delete L;
}

}  // extern "C"
