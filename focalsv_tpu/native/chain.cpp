// Native chaining DP (the host-side scheduling core of seed-chain-extend).
//
// Replaces the Python inner loop of ops/chain.py::_chain_one_strand with the
// same recurrence minimap2 implements in C (chain score with concave gap
// cost over a bounded predecessor window).  Compiled to a shared library and
// called through ctypes; ops/chain.py keeps a pure-numpy fallback.
//
// Build: g++ -O3 -march=native -shared -fPIC chain.cpp -o libfocalsv_native.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// anchors must be pre-sorted by (t, q).  Outputs f (score) and pred (int64,
// -1 = chain start).
void chain_dp(
    const int64_t* t, const int64_t* q, int64_t n,
    int64_t k, int64_t max_pred, int64_t max_gap,
    double* f, int64_t* pred)
{
    const double kd = static_cast<double>(k);
    for (int64_t i = 0; i < n; ++i) {
        f[i] = kd;
        pred[i] = -1;
    }
    for (int64_t i = 1; i < n; ++i) {
        const int64_t j0 = std::max<int64_t>(0, i - max_pred);
        const int64_t ti = t[i], qi = q[i];
        double best = f[i];
        int64_t best_j = -1;
        for (int64_t j = i - 1; j >= j0; --j) {
            const int64_t dt = ti - t[j];
            const int64_t dq = qi - q[j];
            if (dt <= 0 || dq <= 0 || dt > max_gap || dq > max_gap) continue;
            const double match =
                static_cast<double>(std::min(std::min(dq, dt), k));
            const int64_t gap = std::llabs(dt - dq);
            const double cost =
                0.01 * kd * static_cast<double>(gap) + 0.5 * std::log2(static_cast<double>(gap) + 1.0);
            const double sc = f[j] + match - cost;
            if (sc > best) { best = sc; best_j = j; }
        }
        f[i] = best;
        pred[i] = best_j;
    }
}

// Banded affine-gap DP, score-only, unit or affine costs -- used for host
// fallback paths (edit similarity on tiny sequences) when batching to the
// device is not worth the dispatch latency.
int64_t banded_edit_distance(
    const uint8_t* a, int64_t la,
    const uint8_t* b, int64_t lb,
    int64_t band)
{
    // diagonal-band Levenshtein; band must be >= |la - lb| + 1
    const int64_t w = 2 * band + 1;
    const int64_t INF = INT64_C(1) << 40;
    int64_t* prev = new int64_t[w];
    int64_t* cur = new int64_t[w];
    // row 0: D[0][j] = j for j in [0, band]
    for (int64_t kk = 0; kk < w; ++kk) {
        const int64_t j = kk - band;   // j - i offset
        prev[kk] = (j >= 0 && j <= lb) ? j : INF;
    }
    for (int64_t i = 1; i <= la; ++i) {
        for (int64_t kk = 0; kk < w; ++kk) {
            const int64_t j = i + kk - band;
            if (j < 0 || j > lb) { cur[kk] = INF; continue; }
            int64_t v = INF;
            if (j > 0) {
                const int64_t diag = prev[kk];
                if (diag < INF) {
                    const int64_t cost = (a[i - 1] == b[j - 1] && a[i-1] < 4) ? 0 : 1;
                    v = diag + cost;
                }
                if (kk > 0 && cur[kk - 1] < INF)      // left: gap in a
                    v = std::min(v, cur[kk - 1] + 1);
            } else {
                v = i;
            }
            if (kk + 1 < w && prev[kk + 1] < INF)     // up: gap in b
                v = std::min(v, prev[kk + 1] + 1);
            cur[kk] = v;
        }
        std::swap(prev, cur);
    }
    const int64_t kk = lb - la + band;
    int64_t out = (kk >= 0 && kk < w) ? prev[kk] : INF;
    delete[] prev;
    delete[] cur;
    return out;
}

}  // extern "C"
