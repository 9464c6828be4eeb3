// Bipartite edge coloring for the permutation engine's host router.
//
// Same algorithm as tpu_spmv/kernels/permute.py::color_bipartite (the
// classic alternating-path construction behind König's theorem), ported to
// C++ because the router runs it once per 128x128 tile — ~0.3s/tile in
// Python vs ~5ms here, and a 1M-element permutation plan colors ~120 tiles.
//
// C ABI, consumed via ctypes (tpu_spmv/kernels/permute.py prefers it when
// native/libpermute_router.so is built; pure-Python fallback otherwise).

#include <algorithm>
#include <cstdint>
#include <cstddef>
#include <cstdio>
#include <cstdlib>
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

// ---------------------------------------------------------------------------
// Engine v3: color-as-final-lane routing (tpu_spmv/kernels/gpr.py).
//
// Per destination tile, assign every element a final lane = 8*block +
// color such that (see docs/DESIGN.md "engine v3"):
//   - per exchange row r2: all lanes distinct (stage-3 needs a proper
//     coloring: arrival lane = color, b2 routes (color, r2) -> vals row);
//   - per matrix row: lanes inside the row's j-block window (the mask-dot
//     partial [j*W/8, (j+1)*W/8) must belong to ONE row);
//   - j-slots exclusive within each vals row (<= jcap slots usable).
// Greedy j-assignment with quadratic balance + 2-opt repair, then an
// exact per-(block) Konig coloring (max degree <= 8 guaranteed by the
// (r2, block) <= 8 budget).
// ---------------------------------------------------------------------------

namespace {

constexpr int NB = 16;     // 8-lane blocks per 128-lane tile row
constexpr int QV = 128;

// Generalized Konig coloring: vertex spaces [0, nu) x [0, nv), q colors.
int color_nq(const int32_t* src, const int32_t* dst, int64_t n_edges,
             int32_t nu, int32_t nv, int32_t q, int32_t* color) {
  std::vector<int64_t> src_slot((size_t)nu * q, -1);
  std::vector<int64_t> dst_slot((size_t)nv * q, -1);
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
        const int32_t c_old = color[eid];
        if (src_slot[(size_t)src[eid] * q + c_old] == eid)
          src_slot[(size_t)src[eid] * q + c_old] = -1;
        if (dst_slot[(size_t)dst[eid] * q + c_old] == eid)
          dst_slot[(size_t)dst[eid] * q + c_old] = -1;
      }
      for (const int64_t eid : path) {
        const int32_t c_new = (color[eid] == a) ? b : a;
        color[eid] = c_new;
        src_slot[(size_t)src[eid] * q + c_new] = eid;
        dst_slot[(size_t)dst[eid] * q + c_new] = eid;
      }
    }
    color[e] = a;
    src_slot[(size_t)u * q + a] = e;
    dst_slot[(size_t)v * q + a] = e;
  }
  return 0;
}

struct V3Tile {
  // per-element (tile-local) views
  const int32_t* r2;
  const int32_t* rowid;    // tile-local dense row index
  int64_t ne;
  // per-row (tile-local) views
  const int32_t* rW;       // class width (8..128)
  const int32_t* rv;       // vals row within tile [0, 128)
  const int32_t* rjcap;    // usable j-slots in the row's vals row
  int64_t nr;
  // flow structure for cross-row redistribution: an element may ride ANY
  // stage-2 row of its (src tile -> dst tile) flow — stage 1 is a free
  // within-tile permutation, so reassigning an element to a sibling row
  // changes nothing upstream.  eflow[e] is a GLOBAL flow id; rows of
  // flow f are the r2 values frows[frow_off[f] .. frow_off[f+1]).
  const int32_t* eflow;    // per element (tile-local view), global flow id
  const int32_t* frow_off; // global flow CSR offsets
  const int32_t* frows;    // global flow row table (r2 values, tile-local)
};

// Route one tile; lane[e] and er2_out[e] (possibly reassigned stage-2
// row) out.  Returns 0 on success, the residual (r2, block) overflow
// count when that is what failed (restart-worthiness signal), or -1 for
// structural infeasibility (no free j slot / rowblk residue / coloring).
// `salt` perturbs the greedy order (multi-restart escapes local minima).
int64_t v3_route_tile(const V3Tile& T, int32_t* lane, int32_t* er2_out,
                      int32_t sweeps, uint64_t salt) {
  const int64_t ne = T.ne, nr = T.nr;
  // ---- exact path for all-width-128 tiles (hub/wide-row tiles) ----------
  // A W=128 row's j-window is the whole 128-lane row, so the block
  // machinery below adds nothing: the v3 constraints reduce to "lanes
  // proper at each stage-2 row AND at each vals row" — a proper
  // 128-edge-coloring of the (r2, vals row) bipartite multigraph.  Both
  // degrees are <= 128 by construction (<= qcap elements per stage-2
  // row; <= 128 per matrix row), so Konig ALWAYS succeeds — these tiles
  // were exactly the ones the load/rowblk greedy (avg fill 7.3/8) lost.
  {
    bool all128 = nr > 0;
    for (int64_t r = 0; r < nr && all128; ++r)
      if (T.rW[r] != 128) all128 = false;
    if (all128) {
      std::vector<int32_t> ed(ne);
      for (int64_t e = 0; e < ne; ++e) ed[e] = T.rv[T.rowid[e]];
      if (color_nq(T.r2, ed.data(), ne, QV, QV, QV, lane) == 0) {
        for (int64_t e = 0; e < ne; ++e) er2_out[e] = T.r2[e];
        return 0;
      }
      // can't happen by the degree argument; fall through to greedy
    }
  }
  // group elements by row
  std::vector<int64_t> rstart(nr + 1, 0), relems(ne);
  for (int64_t e = 0; e < ne; ++e) rstart[T.rowid[e] + 1]++;
  for (int64_t r = 0; r < nr; ++r) rstart[r + 1] += rstart[r];
  {
    std::vector<int64_t> cur(rstart.begin(), rstart.end() - 1);
    for (int64_t e = 0; e < ne; ++e) relems[cur[T.rowid[e]]++] = e;
  }
  // per-vals-row j occupancy
  std::vector<uint32_t> jused(QV, 0);          // bitmask per vals row
  std::vector<int32_t> rj(nr, -1);             // assigned j per row
  std::vector<int32_t> load(QV * NB, 0);       // (r2, block)
  std::vector<int32_t> eblock(ne, -1);

  // distribute a row's elements into its block set, greedily by load
  auto place_row = [&](int64_t r, int32_t j, bool commit) -> int64_t {
    const int32_t W = T.rW[r], nbr = W / 8, b0 = j * nbr;
    int64_t cost = 0;
    // per-(row, block) cap of 8 ACROSS exchange rows: the final coloring's
    // dst vertex is the vals row, whose per-block degree is this row's
    // per-block total (each block has one owning row)
    int32_t row_blk[NB] = {0};
    // per-r2 runs: elements of the row sorted by r2 (sort tiny ranges)
    const int64_t lo = rstart[r], hi = rstart[r + 1];
    // simple insertion into per-call scratch (rows are <= 128 entries)
    int64_t idx[QV];
    int32_t cnt = 0;
    int32_t seen_r2[QV];
    int32_t seen_n[QV];
    for (int64_t i = lo; i < hi; ++i) {
      const int32_t rr = T.r2[relems[i]];
      int32_t s = -1;
      for (int32_t k2 = 0; k2 < cnt; ++k2)
        if (seen_r2[k2] == rr) { s = k2; break; }
      if (s < 0) { s = cnt++; seen_r2[s] = rr; seen_n[s] = 0; idx[s] = i; }
      seen_n[s]++;
    }
    // NOTE: elements of one row sharing r2 are contiguous in relems only
    // if stable-grouped; we instead re-scan per (r2) below.
    for (int32_t s = 0; s < cnt; ++s) {
      const int32_t rr = seen_r2[s];
      int32_t c = seen_n[s];
      // fill emptiest blocks of the set first, cap 8 per (r2, block)
      int32_t order[NB];
      for (int32_t b = 0; b < nbr; ++b) order[b] = b0 + b;
      for (int32_t a2 = 1; a2 < nbr; ++a2) {  // insertion sort by load
        int32_t key = order[a2];
        int32_t kl = load[(size_t)rr * NB + key];
        int32_t b2 = a2 - 1;
        while (b2 >= 0 && load[(size_t)rr * NB + order[b2]] > kl) {
          order[b2 + 1] = order[b2];
          --b2;
        }
        order[b2 + 1] = key;
      }
      int64_t placed_target[NB];
      int32_t placed_take[NB];
      int32_t nplaced = 0;
      for (int32_t b = 0; b < nbr && c > 0; ++b) {
        const int32_t bb = order[b];
        int32_t room = 8 - load[(size_t)rr * NB + bb];
        const int32_t row_room = 8 - row_blk[bb - b0];
        if (row_room < room) room = row_room;
        if (room <= 0) continue;
        int32_t take = room < c ? room : c;
        row_blk[bb - b0] += take;
        placed_target[nplaced] = bb;
        placed_take[nplaced++] = take;
        c -= take;
        cost += (int64_t)(load[(size_t)rr * NB + bb] + take) *
                    (load[(size_t)rr * NB + bb] + take) -
                (int64_t)load[(size_t)rr * NB + bb] *
                    load[(size_t)rr * NB + bb];
        if (commit) load[(size_t)rr * NB + bb] += take;
      }
      if (c > 0) {
        cost += 1000000LL * c;   // overflow: dump in least-loaded block
        if (commit) {
          placed_target[nplaced] = order[0];
          placed_take[nplaced++] = 0;  // marker handled below
        }
      }
      if (commit) {
        // walk the row's elements with this r2 and write blocks
        int32_t wi = 0, wrem = nplaced ? placed_take[0] : 0;
        for (int64_t i = lo; i < hi; ++i) {
          const int64_t e = relems[i];
          if (T.r2[e] != rr) continue;
          while (wi < nplaced && wrem == 0) {
            ++wi;
            wrem = wi < nplaced ? placed_take[wi] : 0;
          }
          int32_t bb;
          if (wi < nplaced && wrem > 0) {
            bb = (int32_t)placed_target[wi];
            --wrem;
          } else {   // overflow spill: least-loaded block with row room
            bb = -1;
            for (int32_t b2 = 0; b2 < nbr; ++b2) {
              if (row_blk[b2] >= 8) continue;
              if (bb < 0 || load[(size_t)rr * NB + b0 + b2] <
                                load[(size_t)rr * NB + bb])
                bb = b0 + b2;
            }
            if (bb < 0) bb = b0;   // row full beyond capacity: impossible
            row_blk[bb - b0]++;
            load[(size_t)rr * NB + bb]++;
          }
          eblock[e] = bb;
        }
      }
    }
    (void)idx;
    return cost;
  };

  auto unplace_row = [&](int64_t r) {
    for (int64_t i = rstart[r]; i < rstart[r + 1]; ++i) {
      const int64_t e = relems[i];
      load[(size_t)T.r2[e] * NB + eblock[e]]--;
      eblock[e] = -1;
    }
  };

  // ---- greedy: heaviest rows first --------------------------------------
  std::vector<int64_t> rorder(nr);
  for (int64_t r = 0; r < nr; ++r) rorder[r] = r;
  auto mix = [salt](int64_t r) {
    uint64_t x = (uint64_t)r * 0x9e3779b97f4a7c15ULL + salt;
    x ^= x >> 33;
    x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33;
    return x;
  };
  std::sort(rorder.begin(), rorder.end(), [&](int64_t a, int64_t b) {
    const int64_t la = rstart[a + 1] - rstart[a];
    const int64_t lb = rstart[b + 1] - rstart[b];
    if (la != lb) return la > lb;
    return mix(a) < mix(b);     // salted tie-break for restarts
  });
  for (const int64_t r : rorder) {
    const int32_t W = T.rW[r], kslots = QV / W;
    const int32_t v = T.rv[r], jcap = T.rjcap[r];
    int64_t best_cost = -1;
    int32_t best_j = -1;
    for (int32_t j = 0; j < kslots && j < jcap; ++j) {
      if (jused[v] & (1u << j)) continue;
      const int64_t cost = place_row(r, j, false);
      if (best_cost < 0 || cost < best_cost) {
        best_cost = cost;
        best_j = j;
      }
    }
    if (best_j < 0) {                // no free j slot at all
      if (getenv("V3_DEBUG"))
        fprintf(stderr, "v3: no free j for row %lld (v=%d W=%d jcap=%d "
                "used=%x)\n", (long long)r, v, W, jcap, jused[v]);
      return -1;
    }
    rj[r] = best_j;
    jused[v] |= (1u << best_j);
    place_row(r, best_j, true);
  }

  auto overflow_total = [&]() {
    int64_t s = 0;
    for (size_t i = 0; i < load.size(); ++i)
      if (load[i] > 8) s += load[i] - 8;
    return s;
  };

  // ---- repair sweeps: move/swap j within the vals row --------------------
  // small rows first: they relocate with the least collateral load shift
  std::vector<int64_t> rfix(rorder.rbegin(), rorder.rend());
  for (int32_t sweep = 0; sweep < sweeps; ++sweep) {
    if (overflow_total() == 0) break;
    bool improved = false;
    for (const int64_t r : rfix) {
      // does this row touch an overloaded cell?
      bool touches = false;
      for (int64_t i = rstart[r]; i < rstart[r + 1] && !touches; ++i) {
        const int64_t e = relems[i];
        if (load[(size_t)T.r2[e] * NB + eblock[e]] > 8) touches = true;
      }
      if (!touches) continue;
      const int32_t W = T.rW[r], kslots = QV / W;
      const int32_t v = T.rv[r], jcap = T.rjcap[r];
      const int32_t j_cur = rj[r];
      const int64_t before = overflow_total();
      bool done = false;
      // (a) move to a free slot
      for (int32_t j = 0; j < kslots && j < jcap && !done; ++j) {
        if (j == j_cur || (jused[v] & (1u << j))) continue;
        unplace_row(r);
        place_row(r, j, true);
        if (overflow_total() < before) {
          jused[v] = (jused[v] & ~(1u << j_cur)) | (1u << j);
          rj[r] = j;
          improved = done = true;
        } else {
          unplace_row(r);
          place_row(r, j_cur, true);
        }
      }
      if (done) continue;
      // (b) swap with a sibling row of the same vals row & width
      for (int64_t r2x = 0; r2x < nr && !done; ++r2x) {
        if (r2x == r || T.rv[r2x] != v || T.rW[r2x] != W) continue;
        const int32_t j_x = rj[r2x];
        unplace_row(r);
        unplace_row(r2x);
        place_row(r, j_x, true);
        place_row(r2x, j_cur, true);
        if (overflow_total() < before) {
          rj[r] = j_x;
          rj[r2x] = j_cur;
          improved = done = true;
        } else {
          unplace_row(r);
          unplace_row(r2x);
          place_row(r, j_cur, true);
          place_row(r2x, j_x, true);
        }
      }
    }
    if (!improved) break;
  }

  // ---- element-level repair ----------------------------------------------
  // The row-level sweeps move WHOLE rows between j-slots; residual
  // overflows are typically single-digit (3-9 measured on power-law
  // chunks) and need finer moves.  Three degrees of freedom per element:
  //   (a) any block of its matrix row's j-window (move within its r2);
  //   (b) swap blocks with a same-row element of a different r2;
  //   (c) any sibling stage-2 row of its FLOW (er2 reassignment — the
  //       element rides a different exchange row of the same (ts -> td)
  //       flow; stage 1 is a free within-tile permutation, so upstream
  //       nothing changes).  (c) is what clears the clustered-flow
  //       overflows (1-11 units measured on power-law chunks) that
  //       in-row moves cannot.
  // Also clears dst-side (row, block) > 8 cells the greedy spill creates.
  std::vector<int32_t> er2(ne);
  for (int64_t e = 0; e < ne; ++e) er2[e] = T.r2[e];
  if (overflow_total() != 0) {
    std::vector<int32_t> rowblk((size_t)nr * NB, 0);
    for (int64_t e = 0; e < ne; ++e)
      rowblk[(size_t)T.rowid[e] * NB + eblock[e]]++;
    std::vector<int32_t> r2cnt(QV, 0);
    for (int64_t e = 0; e < ne; ++e) r2cnt[er2[e]]++;
    auto cell_bad = [&](int64_t e) {
      return load[(size_t)er2[e] * NB + eblock[e]] > 8 ||
             rowblk[(size_t)T.rowid[e] * NB + eblock[e]] > 8;
    };
    for (int32_t sweep = 0; sweep < 16; ++sweep) {
      if (overflow_total() == 0) break;
      bool moved = false;
      for (int64_t e = 0; e < ne; ++e) {
        if (!cell_bad(e)) continue;
        const int32_t rr = er2[e];
        const int64_t r = T.rowid[e];
        const int32_t bb = eblock[e];
        const int32_t W = T.rW[r], nbr = W / 8, b0 = rj[r] * nbr;
        // (a) simple move within the row's window
        bool done = false;
        for (int32_t d = 0; d < nbr && !done; ++d) {
          const int32_t b2 = b0 + d;
          if (b2 == bb) continue;
          if (load[(size_t)rr * NB + b2] >= 8) continue;
          if (rowblk[(size_t)r * NB + b2] >= 8) continue;
          load[(size_t)rr * NB + bb]--;
          load[(size_t)rr * NB + b2]++;
          rowblk[(size_t)r * NB + bb]--;
          rowblk[(size_t)r * NB + b2]++;
          eblock[e] = b2;
          moved = done = true;
        }
        if (done) continue;
        // (c) ride a sibling row of the flow: same block first (rowblk
        // untouched), then any window block with room on both sides
        if (T.eflow != nullptr &&
            load[(size_t)rr * NB + bb] > 8) {   // (c) only fixes load
          const int32_t f = T.eflow[e];
          for (int32_t pass = 0; pass < 2 && !done; ++pass) {
            for (int32_t fi = T.frow_off[f];
                 fi < T.frow_off[f + 1] && !done; ++fi) {
              const int32_t rr2 = T.frows[fi];
              if (rr2 == rr || r2cnt[rr2] >= QV) continue;
              for (int32_t d = 0; d < nbr && !done; ++d) {
                const int32_t b2 = b0 + d;
                if (pass == 0 && b2 != bb) continue;   // same-block pass
                if (pass == 1 && b2 == bb) continue;
                if (load[(size_t)rr2 * NB + b2] >= 8) continue;
                if (b2 != bb && rowblk[(size_t)r * NB + b2] >= 8) continue;
                load[(size_t)rr * NB + bb]--;
                load[(size_t)rr2 * NB + b2]++;
                if (b2 != bb) {
                  rowblk[(size_t)r * NB + bb]--;
                  rowblk[(size_t)r * NB + b2]++;
                }
                r2cnt[rr]--;
                r2cnt[rr2]++;
                er2[e] = rr2;
                eblock[e] = b2;
                moved = done = true;
              }
            }
          }
        }
        if (done) continue;
        // (b) swap blocks with a same-row element of a different r2
        for (int64_t i = rstart[r]; i < rstart[r + 1] && !done; ++i) {
          const int64_t e2 = relems[i];
          const int32_t rr2 = er2[e2];
          const int32_t b2 = eblock[e2];
          if (e2 == e || b2 == bb || rr2 == rr) continue;
          if (load[(size_t)rr * NB + b2] >= 8) continue;   // e -> b2
          if (load[(size_t)rr2 * NB + bb] >= 8) continue;  // e2 -> bb
          load[(size_t)rr * NB + bb]--;
          load[(size_t)rr * NB + b2]++;
          load[(size_t)rr2 * NB + b2]--;
          load[(size_t)rr2 * NB + bb]++;
          eblock[e] = b2;
          eblock[e2] = bb;
          moved = done = true;
        }
      }
      if (!moved) break;
    }
    // dst-side residue check (rowblk > 8 would fail the block coloring)
    for (size_t i = 0; i < rowblk.size(); ++i)
      if (rowblk[i] > 8) {
        if (getenv("V3_DEBUG"))
          fprintf(stderr, "v3: residual rowblk overflow (ne=%lld)\n",
                  (long long)ne);
        return -1;
      }
  }
  if (overflow_total() != 0) {
    if (getenv("V3_DEBUG")) {
      // decompose the residue: which side is stuck, and how much row
      // freedom the flows actually had
      int64_t bad_load = 0;
      for (size_t i = 0; i < load.size(); ++i)
        if (load[i] > 8) bad_load++;
      int64_t single_row_flows = 0, multi_row_flows = 0;
      if (T.eflow) {
        std::vector<int32_t> seen;
        for (int64_t e = 0; e < ne; ++e) {
          const int32_t f = T.eflow[e];
          bool dup = false;
          for (int32_t s : seen) if (s == f) { dup = true; break; }
          if (dup) continue;
          seen.push_back(f);
          if (T.frow_off[f + 1] - T.frow_off[f] > 1) multi_row_flows++;
          else single_row_flows++;
        }
      }
      // widths histogram of rows touching overloaded cells
      int64_t w128_rows = 0;
      for (int64_t r = 0; r < nr; ++r) if (T.rW[r] == 128) w128_rows++;
      fprintf(stderr,
              "v3: residual overflow %lld (ne=%lld nr=%lld badload=%lld "
              "flows1=%lld flowsN=%lld w128rows=%lld)\n",
              (long long)overflow_total(), (long long)ne, (long long)nr,
              (long long)bad_load, (long long)single_row_flows,
              (long long)multi_row_flows, (long long)w128_rows);
    }
    return overflow_total();
  }

  // ---- exact per-block coloring ------------------------------------------
  // edges of block b: (src=r2, dst=vals row) — degree <= 8 both sides
  for (int32_t b = 0; b < NB; ++b) {
    std::vector<int32_t> es, ed;
    std::vector<int64_t> eid;
    es.reserve(ne / NB + 8);
    for (int64_t e = 0; e < ne; ++e) {
      if (eblock[e] != b) continue;
      es.push_back(er2[e]);
      ed.push_back(T.rv[T.rowid[e]]);
      eid.push_back(e);
    }
    if (es.empty()) continue;
    std::vector<int32_t> col(es.size(), -1);
    if (color_nq(es.data(), ed.data(), (int64_t)es.size(), QV, QV, 8,
                 col.data()) != 0) {
      if (getenv("V3_DEBUG"))
        fprintf(stderr, "v3: coloring failed for block %d (%zu edges)\n",
                b, es.size());
      return -1;
    }
    for (size_t i = 0; i < eid.size(); ++i)
      lane[eid[i]] = 8 * b + col[i];
  }
  for (int64_t e = 0; e < ne; ++e) er2_out[e] = er2[e];
  return 0;
}

}  // namespace

extern "C" {

// Greedy graph coloring over a symmetric CSR pattern (multicolor
// Gauss-Seidel, solvers/relaxation.py): color[i] = smallest color absent
// among already-colored neighbors.  O(nnz); the Python per-row loop this
// replaces took minutes at 16.7M rows.  Returns the color count.
int32_t greedy_color(const int64_t* indptr, const int32_t* indices,
                     int64_t n, int32_t* color) {
  std::vector<int64_t> mark(64, -1);   // mark[c] == i: color c is taken
  int32_t ncolors = 0;
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = indptr[i]; j < indptr[i + 1]; ++j) {
      const int32_t c = color[indices[j]];
      if (c >= 0) {
        if ((size_t)c >= mark.size()) mark.resize(2 * (size_t)c + 1, -1);
        mark[c] = i;
      }
    }
    int32_t c = 0;
    while ((size_t)c < mark.size() && mark[c] == i) ++c;
    color[i] = c;
    if (c + 1 > ncolors) ncolors = c + 1;
  }
  return ncolors;
}

// ABI version of the v3 entry point below: Python refuses v3 routing when
// the loaded .so reports a different version (stale build -> silent v2
// fallback rather than a miscalled signature).
int32_t v3_abi_version(void) { return 2; }

// v3 routing over all destination tiles (OpenMP).  Element arrays are
// grouped by tile via eoff; row tables via roff.  eflow/frow_off/frows
// describe the (ts -> td) flow structure for cross-row redistribution
// (global flow ids; pass eflow=NULL to disable).  Writes lane[e] and
// er2[e] (the element's possibly-reassigned stage-2 row); returns 0 on
// success or 1-based index of the first infeasible tile.
int64_t v3_route(const int32_t* r2, const int32_t* rowid,
                 const int64_t* eoff,
                 const int32_t* rW, const int32_t* rv, const int32_t* rjcap,
                 const int64_t* roff,
                 const int32_t* eflow, const int32_t* frow_off,
                 const int32_t* frows,
                 int64_t ntiles, int32_t sweeps,
                 int32_t* lane, int32_t* er2) {
  int64_t failed = 0;
#pragma omp parallel for schedule(dynamic)
  for (int64_t t = 0; t < ntiles; ++t) {
    // the plan is all-or-nothing: once any tile is infeasible, skip the
    // rest (atomic read — a hint only; the critical write is the truth).
    // Failing probes (the qcap ladder) get cheap instead of paying the
    // full tile sweep per rung.
    int64_t failed_now;
#pragma omp atomic read
    failed_now = failed;
    if (failed_now != 0) continue;
    V3Tile T;
    T.r2 = r2 + eoff[t];
    T.rowid = rowid + eoff[t];
    T.ne = eoff[t + 1] - eoff[t];
    T.rW = rW + roff[t];
    T.rv = rv + roff[t];
    T.rjcap = rjcap + roff[t];
    T.nr = roff[t + 1] - roff[t];
    T.eflow = eflow ? eflow + eoff[t] : nullptr;
    T.frow_off = frow_off;
    T.frows = frows;
    if (T.ne == 0) continue;
    int64_t ok = -1;
    for (uint64_t restart = 0; restart < 8 && ok != 0; ++restart) {
      ok = v3_route_tile(T, lane + eoff[t], er2 + eoff[t], sweeps,
                         restart * 0x2545f4914f6cdd1dULL);
      // persistent LARGE residual overflow: three salted restarts that
      // never get below 24 are not going to land a zero on the next
      // five (restarts do rescue tiles whose first attempt is dozens
      // over — the 700k uniform pack needs them — so only an all-large
      // streak aborts)
      if (restart >= 2 && ok > 24) break;
    }
    if (ok != 0) {
#pragma omp critical
      if (failed == 0 || t + 1 < failed) {
#pragma omp atomic write
        failed = t + 1;
      }
    }
  }
  return failed;
}

}  // extern "C"
