// Sequential-order pairwise euclidean distances for the Ward-linkage init.
//
// scipy.spatial.distance.pdist's C kernel accumulates one feature at a
// time per pair: s += (u[k]-v[k])^2 in k order, then sqrt.  The EM init's
// bitwise-scipy parity contract (svscope_tpu/models/mixture.py::
// ward_linkage, replacing scipy linkage at reference
// src/ReadsCluster.py:242-243) depends on reproducing that exact rounding
// sequence — NumPy's pairwise-summation reductions differ by ~1 ulp,
// enough to flip downstream tie comparisons and reorder equal-height Ward
// merges.  The Python fallback therefore loops features sequentially,
// costing ~0.5 s at n=500 (125M fused sub/mul/add passes through (n,n)
// temporaries per feature).
//
// This kernel keeps the exact per-element operation order — for each pair
// the k loop is sequential with a single accumulator — but vectorizes over
// PAIRS: lanes are independent (i,j) accumulators, so SIMD never
// reassociates any pair's sum.  Input is transposed (nf, n) so the inner
// j loop is unit-stride.  Compiled with -ffp-contract=off: a fused
// multiply-add would skip the intermediate d*d rounding that scipy's and
// NumPy's separate ops perform.
//
// ~30 ms single-thread at n=nf=500 (vs ~0.5 s in Python), threaded over
// rows for larger inputs.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// xt: (nf, n) row-major (feature-major); out: (n, n) squared... no —
// full euclidean distances, diagonal left at 0.
void pdist_seq(const double* xt, int64_t n, int64_t nf, double* out,
               int32_t n_threads) {
    auto run_rows = [&](int64_t i0, int64_t i1) {
        for (int64_t i = i0; i < i1; ++i) {
            double* row = out + i * n;
            std::memset(row, 0, sizeof(double) * n);
            for (int64_t k = 0; k < nf; ++k) {
                const double xi = xt[k * n + i];
                const double* xr = xt + k * n;
                for (int64_t j = 0; j < n; ++j) {
                    const double d = xi - xr[j];
                    row[j] += d * d;
                }
            }
            for (int64_t j = 0; j < n; ++j) row[j] = std::sqrt(row[j]);
        }
    };
    if (n_threads <= 1 || n < 64) {
        run_rows(0, n);
        return;
    }
    std::vector<std::thread> pool;
    const int64_t t = n_threads;
    for (int64_t w = 0; w < t; ++w) {
        const int64_t i0 = n * w / t, i1 = n * (w + 1) / t;
        if (i0 < i1) pool.emplace_back(run_rows, i0, i1);
    }
    for (auto& th : pool) th.join();
}

}  // extern "C"
