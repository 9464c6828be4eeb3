// Bipartite edge coloring for the permutation engine's host router.
//
// Same algorithm as tpu_spmv/kernels/permute.py::color_bipartite (the
// classic alternating-path construction behind König's theorem), ported to
// C++ because the router runs it once per 128x128 tile — ~0.3s/tile in
// Python vs ~5ms here, and a 1M-element permutation plan colors ~120 tiles.
//
// C ABI, consumed via ctypes (tpu_spmv/kernels/permute.py prefers it when
// native/libpermute_router.so is built; pure-Python fallback otherwise).

#include <cstdint>
#include <cstddef>
using std::size_t;
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// src/dst: edge endpoints in [0, q); color: output, length n_edges.
// Returns 0 on success, -1 if a vertex exceeds degree q.
int color_bipartite(const int32_t* src, const int32_t* dst, int64_t n_edges,
                    int32_t q, int32_t* color) {
  std::vector<int64_t> src_slot((size_t)q * q, -1);
  std::vector<int64_t> dst_slot((size_t)q * q, -1);
  // per-vertex cursor for "first free color" scans (amortized)
  std::vector<int32_t> color_out(n_edges, -1);
  std::vector<int64_t> path;
  path.reserve(2 * q);

  auto first_free = [&](std::vector<int64_t>& slot, int32_t v) -> int32_t {
    const int64_t* row = &slot[(size_t)v * q];
    for (int32_t c = 0; c < q; ++c)
      if (row[c] < 0) return c;
    return -1;
  };

  for (int64_t e = 0; e < n_edges; ++e) {
    const int32_t u = src[e], v = dst[e];
    const int32_t a = first_free(src_slot, u);
    const int32_t b = first_free(dst_slot, v);
    if (a < 0 || b < 0) return -1;
    if (a != b) {
      // walk the a/b-alternating path from v, collect, flip
      path.clear();
      int32_t node = v;
      bool on_dst = true;
      int32_t col = a;
      while (true) {
        const int64_t eid = on_dst ? dst_slot[(size_t)node * q + col]
                                   : src_slot[(size_t)node * q + col];
        if (eid < 0) break;
        path.push_back(eid);
        if (on_dst) {
          node = src[eid];
          on_dst = false;
        } else {
          node = dst[eid];
          on_dst = true;
        }
        col = (col == a) ? b : a;
      }
      for (const int64_t eid : path) {
        const int32_t c_old = color_out[eid];
        if (src_slot[(size_t)src[eid] * q + c_old] == eid)
          src_slot[(size_t)src[eid] * q + c_old] = -1;
        if (dst_slot[(size_t)dst[eid] * q + c_old] == eid)
          dst_slot[(size_t)dst[eid] * q + c_old] = -1;
      }
      for (const int64_t eid : path) {
        const int32_t c_new = (color_out[eid] == a) ? b : a;
        color_out[eid] = c_new;
        src_slot[(size_t)src[eid] * q + c_new] = eid;
        dst_slot[(size_t)dst[eid] * q + c_new] = eid;
      }
    }
    color_out[e] = a;
    src_slot[(size_t)u * q + a] = e;
    dst_slot[(size_t)v * q + a] = e;
  }
  for (int64_t e = 0; e < n_edges; ++e) color[e] = color_out[e];
  return 0;
}

// Batched variant: ntiles independent coloring problems, edges of tile t
// in [offsets[t], offsets[t+1]).  One ctypes round-trip for a whole plan
// (a 1M-element permutation colors ~120+ tiles), OpenMP across tiles.
// Returns 0 on success, or 1-based index of the first failing tile.
int64_t color_bipartite_batch(const int32_t* src, const int32_t* dst,
                              const int64_t* offsets, int64_t ntiles,
                              int32_t q, int32_t* color) {
  int64_t failed = 0;
#pragma omp parallel for schedule(dynamic)
  for (int64_t t = 0; t < ntiles; ++t) {
    const int64_t lo = offsets[t], hi = offsets[t + 1];
    if (color_bipartite(src + lo, dst + lo, hi - lo, q, color + lo) != 0) {
#pragma omp critical
      if (failed == 0 || t + 1 < failed) failed = t + 1;
    }
  }
  return failed;
}

}  // extern "C"
