// Native host-side builders for spindynamics_tpu: sector-basis enumeration and
// ELL neighbor-table construction (OpenMP).
//
// The TPU compute path is JAX/XLA/Pallas; this library accelerates the one-time
// host setup that the reference does per-run in Julia (basis enumeration,
// src/Basis.jl:24-39; Dict-based index mapping, src/SpinModel.jl:11). At
// L = 28..32 the sector has 4e7..6e8 states and the numpy fallback becomes the
// wall-clock bottleneck; here enumeration is embarrassingly parallel over
// leading-bit prefixes and rank lookup is the O(L) combinadic closed form.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int kMaxL = 32;

// C[n][k] binomial table, n,k <= 32. C(32,16) = 601080390 < 2^31.
struct BinomTable {
  int64_t c[kMaxL + 1][kMaxL + 1];
  BinomTable() {
    std::memset(c, 0, sizeof(c));
    for (int n = 0; n <= kMaxL; ++n) {
      c[n][0] = 1;
      for (int k = 1; k <= n; ++k)
        c[n][k] = c[n - 1][k - 1] + c[n - 1][k];
    }
  }
};
const BinomTable kBinom;

inline int64_t binom(int n, int k) {
  if (k < 0 || k > n || n < 0 || n > kMaxL) return 0;
  return kBinom.c[n][k];
}

// Combinadic rank of `state` within the ascending enumeration of L-bit states
// with fixed popcount: rank = sum_t C(p_t, t) over ascending set-bit positions.
inline int64_t rank_state(uint32_t state) {
  int64_t r = 0;
  int t = 0;
  while (state) {
    int p = __builtin_ctz(state);
    state &= state - 1;
    ++t;
    r += binom(p, t);
  }
  return r;
}

// Unrank: index -> state (colex combinadic), for block-parallel enumeration.
inline uint32_t unrank_state(int64_t idx, int L, int k) {
  uint32_t s = 0;
  for (int p = L - 1; p >= 0 && k > 0; --p) {
    int64_t c = binom(p, k);
    if (idx >= c) {
      s |= (1u << p);
      idx -= c;
      --k;
    }
  }
  return s;
}

}  // namespace

extern "C" {

// Fill `out` (size C(L, nup)) with the ascending sector basis. Returns the
// number of states written, or -1 on bad arguments.
long long sd_sector_basis(int L, int nup, uint32_t* out) {
  if (L < 1 || L > kMaxL || nup < 0 || nup > L || !out) return -1;
  const int64_t N = binom(L, nup);
#pragma omp parallel
  {
#ifdef _OPENMP
    const int nth = omp_get_num_threads();
    const int tid = omp_get_thread_num();
#else
    const int nth = 1, tid = 0;
#endif
    const int64_t lo = N * tid / nth;
    const int64_t hi = N * (tid + 1) / nth;
    if (lo < hi) {
      // Seed the block with unrank, then advance with Gosper's hack — O(1)
      // per state instead of O(L) per unrank.
      uint32_t s = unrank_state(lo, L, nup);
      for (int64_t i = lo; i < hi; ++i) {
        out[i] = s;
        // next state with same popcount (Gosper)
        uint32_t c = s & (~s + 1u);
        uint32_t r = s + c;
        if (c) s = (((r ^ s) >> 2) / c) | r;
      }
    }
  }
  return (long long)N;
}

// Build the ELL neighbor table nbr[N][nb]: rank of (state XOR mask_b) when bits
// (i_b, j_b) differ, else -1. Returns 0 on success.
int sd_ell_table(const uint32_t* states, long long N, int L, int nup,
                 const int32_t* hop_i, const int32_t* hop_j, int n_bonds,
                 int32_t* nbr) {
  if (!states || !nbr || N < 0 || L < 1 || L > kMaxL) return 1;
  (void)nup;
#pragma omp parallel for schedule(static)
  for (long long n = 0; n < N; ++n) {
    const uint32_t s = states[n];
    int32_t* row = nbr + (size_t)n * n_bonds;
    for (int b = 0; b < n_bonds; ++b) {
      const int i = hop_i[b], j = hop_j[b];
      const uint32_t differ = ((s >> i) ^ (s >> j)) & 1u;
      if (differ) {
        const uint32_t flipped = s ^ ((1u << i) | (1u << j));
        row[b] = (int32_t)rank_state(flipped);
      } else {
        row[b] = -1;
      }
    }
  }
  return 0;
}

}  // extern "C"
