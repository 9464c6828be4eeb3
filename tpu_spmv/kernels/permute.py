"""General permutation engine for TPU — host-routed, gather/transpose only.

The TPU's only fast irregular-data-movement primitive is the lane-window
gather (within 128 lanes).  Arbitrary permutations — the missing link for
fast general sparse kernels (segment-grouped gather → row-sorted reduce,
see docs/DESIGN.md roadmap) — are composed from it classically:

**Within a ``[128, 128]`` tile** any permutation factors into three
lane-gather phases with two transposes between them (the 3-stage Clos /
mesh-routing decomposition):

    out = G3( T( G2( T( G1(x) ) ) ) )

where phase 2's feasibility — *every intermediate column holds at most one
element per source row and per destination row* — is exactly a proper
128-edge-coloring of the bipartite multigraph (source rows × destination
rows, one edge per element), which König's theorem guarantees.
:func:`plan_tile_permutation` computes the coloring (alternating-path
algorithm) and emits the three index planes; :func:`apply_tile_permutation`
is the Pallas kernel (G-T-G-T-G, all VPU work).

Scaling beyond one tile (cross-tile element exchange via whole-row
stacking + per-tile routing) is the next layer; this module is the
load-bearing core.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["color_bipartite", "color_bipartite_tiles",
           "plan_tile_permutation", "apply_tile_permutation",
           "permute_reference", "PermutationPlan", "plan_permutation",
           "TwoLevelPlan", "plan_permutation_two_level",
           "plan_permutation_auto", "apply_permutation",
           "apply_permutation_batched", "apply_stage23_flat"]

Q = 128


import ctypes as _ctypes
import functools as _functools
import os as _os


@_functools.cache
def _native_router():
    from ..utils import ensure_native_built

    ensure_native_built()
    for path in (
        _os.environ.get("TPU_SPMV_NATIVE_ROUTER", ""),
        _os.path.join(_os.path.dirname(__file__), "..", "..", "native",
                      "libpermute_router.so"),
    ):
        if path and _os.path.exists(path):
            lib = _ctypes.CDLL(path)
            lib.color_bipartite.restype = _ctypes.c_int
            lib.color_bipartite.argtypes = [
                _ctypes.POINTER(_ctypes.c_int32),
                _ctypes.POINTER(_ctypes.c_int32),
                _ctypes.c_int64, _ctypes.c_int32,
                _ctypes.POINTER(_ctypes.c_int32),
            ]
            if hasattr(lib, "color_bipartite_batch"):
                lib.color_bipartite_batch.restype = _ctypes.c_int64
                lib.color_bipartite_batch.argtypes = [
                    _ctypes.POINTER(_ctypes.c_int32),
                    _ctypes.POINTER(_ctypes.c_int32),
                    _ctypes.POINTER(_ctypes.c_int64),
                    _ctypes.c_int64, _ctypes.c_int32,
                    _ctypes.POINTER(_ctypes.c_int32),
                ]
            return lib
    return None


def color_bipartite_tiles(src: np.ndarray, dst: np.ndarray,
                          q: int = Q) -> np.ndarray:
    """Color ``T`` independent tile problems at once (``src``/``dst`` are
    ``[T, E]``).  One ctypes round-trip + OpenMP across tiles via the C++
    router's batch entry point; per-tile Python fallback otherwise."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    T_, E = src.shape
    lib = _native_router()
    if lib is not None and hasattr(lib, "color_bipartite_batch"):
        s32 = np.ascontiguousarray(src.reshape(-1), dtype=np.int32)
        d32 = np.ascontiguousarray(dst.reshape(-1), dtype=np.int32)
        offs = (np.arange(T_ + 1, dtype=np.int64) * E)
        out = np.empty(T_ * E, dtype=np.int32)
        rc = lib.color_bipartite_batch(
            s32.ctypes.data_as(_ctypes.POINTER(_ctypes.c_int32)),
            d32.ctypes.data_as(_ctypes.POINTER(_ctypes.c_int32)),
            offs.ctypes.data_as(_ctypes.POINTER(_ctypes.c_int64)),
            T_, q,
            out.ctypes.data_as(_ctypes.POINTER(_ctypes.c_int32)),
        )
        if rc != 0:
            raise ValueError(f"tile {rc - 1}: a vertex has degree > {q}")
        return out.reshape(T_, E).astype(np.int64)
    return np.stack([color_bipartite(src[t], dst[t], q)
                     for t in range(T_)])


def color_bipartite(src: np.ndarray, dst: np.ndarray, q: int = Q) -> np.ndarray:
    """Proper q-edge-coloring of a bipartite multigraph with max degree <= q.

    ``src[i]``/``dst[i]`` are the endpoints of edge ``i`` (values in
    [0, q)).  Returns a color per edge such that no two edges sharing a
    source or a destination get the same color.  Classic alternating-path
    (Vizing-for-bipartite) algorithm: O(E * path_length).

    Uses the C++ router (``native/libpermute_router.so``) when built —
    ~50x faster than the Python loop, which is the fallback.
    """
    lib = _native_router()
    if lib is not None:
        s32 = np.ascontiguousarray(src, dtype=np.int32)
        d32 = np.ascontiguousarray(dst, dtype=np.int32)
        out = np.empty(len(s32), dtype=np.int32)
        rc = lib.color_bipartite(
            s32.ctypes.data_as(_ctypes.POINTER(_ctypes.c_int32)),
            d32.ctypes.data_as(_ctypes.POINTER(_ctypes.c_int32)),
            len(s32), q,
            out.ctypes.data_as(_ctypes.POINTER(_ctypes.c_int32)),
        )
        if rc != 0:
            raise ValueError(f"a vertex has degree > {q}")
        return out.astype(np.int64)
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    E = len(src)
    src_slot = np.full((q, q), -1, dtype=np.int64)   # src_slot[u, c] = edge
    dst_slot = np.full((q, q), -1, dtype=np.int64)
    color = np.full(E, -1, dtype=np.int64)

    for e in range(E):
        u, v = int(src[e]), int(dst[e])
        a = int(np.argmax(src_slot[u] < 0))
        if src_slot[u, a] >= 0:
            raise ValueError(f"source row {u} has degree > {q}")
        b = int(np.argmax(dst_slot[v] < 0))
        if dst_slot[v, b] >= 0:
            raise ValueError(f"destination row {v} has degree > {q}")
        if a != b:
            # walk the a/b-alternating path from v (first edge: colored a
            # at v), collect it, then flip a<->b along it.  The path can
            # never reach u via color a (a is free at u) nor cycle, so the
            # flip frees color a at v.  König constructively.
            path = []
            node, side, col = v, "dst", a
            while True:
                eid = int(dst_slot[node, col] if side == "dst"
                          else src_slot[node, col])
                if eid < 0:
                    break
                path.append(eid)
                if side == "dst":
                    node, side = int(src[eid]), "src"
                else:
                    node, side = int(dst[eid]), "dst"
                col = b if col == a else a
            for eid in path:        # clear old slots
                c_old = int(color[eid])
                if src_slot[src[eid], c_old] == eid:
                    src_slot[src[eid], c_old] = -1
                if dst_slot[dst[eid], c_old] == eid:
                    dst_slot[dst[eid], c_old] = -1
            for eid in path:        # rebind with flipped colors
                c_new = b if color[eid] == a else a
                color[eid] = c_new
                src_slot[src[eid], c_new] = eid
                dst_slot[dst[eid], c_new] = eid
        color[e] = a
        src_slot[u, a] = e
        dst_slot[v, a] = e
    return color


def permute_reference(x: np.ndarray, perm: np.ndarray) -> np.ndarray:
    """``out[i] = x[perm[i]]`` (numpy oracle)."""
    return np.asarray(x).ravel()[perm].reshape(np.asarray(x).shape)


def plan_tile_permutation(perm: np.ndarray):
    """Index planes (g1, g2, g3) realizing ``out.flat[i] = x.flat[perm[i]]``
    on a ``[128, 128]`` tile via G-T-G-T-G.

    ``perm`` is a permutation of ``range(128*128)`` (flat, row-major).
    """
    perm = np.asarray(perm, dtype=np.int64)
    if perm.shape != (Q * Q,):
        raise ValueError(f"perm must have {Q * Q} entries")
    dst_r, dst_c = np.divmod(np.arange(Q * Q, dtype=np.int64), Q)
    src_r, src_c = np.divmod(perm, Q)
    colors = color_bipartite(src_r, dst_r)
    g1 = np.zeros((Q, Q), dtype=np.int32)   # z1[r, m]  = x[r, g1[r, m]]
    g2 = np.zeros((Q, Q), dtype=np.int32)   # z3[m, r'] = z2[m, g2[m, r']]
    g3 = np.zeros((Q, Q), dtype=np.int32)   # out[r',c']= z4[r', g3[r', c']]
    g1[src_r, colors] = src_c
    g2[colors, dst_r] = src_r
    g3[dst_r, dst_c] = colors
    return g1, g2, g3


def _tile_perm_kernel(x_ref, g1_ref, g2_ref, g3_ref, o_ref):
    o_ref[:] = _gtgtg(x_ref[:], g1_ref[:], g2_ref[:], g3_ref[:])


def apply_tile_permutation(x, planes, *, interpret: bool = False):
    """Apply a planned within-tile permutation to a ``[128, 128]`` array."""
    g1, g2, g3 = (jnp.asarray(g) for g in planes)
    return pl.pallas_call(
        _tile_perm_kernel,
        out_shape=jax.ShapeDtypeStruct((Q, Q), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, g1, g2, g3)


# ---------------------------------------------------------------------------
# Multi-tile permutations: consolidate -> exchange rows -> place
# ---------------------------------------------------------------------------

from ..formats.base import sparse_dataclass, static_field  # noqa: E402

TILE = Q * Q          # elements per [128, 128] tile


@sparse_dataclass
class PermutationPlan:
    """Host-routed plan applying ``out.flat[i] = x.flat[perm[i]]``.

    Three stages (two fused Pallas calls):

    1. within each *source* tile, consolidate elements into whole rows by
       destination tile (planes ``a1/a2/a3``, G-T-G-T-G);
    2. exchange whole rows across tiles (``rowsrc``: for each global dest
       row, the global source row) — per-sublane dynamic slices;
    3. within each *destination* tile, place elements at their final
       positions — T-G-T-G with planes ``b2/b3`` only: the exchange moves
       whole rows, so stage 3's leading lane-gather (``b1``) commutes with
       it and is pre-composed into ``a3`` at plan time (one fewer VPU
       gather + one fewer int8 plane per pass; lane-gathers measured
       96 ns/tile on chip).

    Feasibility requires every tile to send and receive <= 128 whole rows;
    group-per-row padding makes this tight near T = 128 tiles, so keep
    permutations <= ~512k elements per call (T <= 32) for slack.
    """

    a1: jax.Array   # [T, 128, 128] int8 — lane indices < 128
    a2: jax.Array
    a3: jax.Array   # b1-composed (see class docstring)
    rowsrc: jax.Array   # [T*128] int32 global source row per dest row
    b2: jax.Array
    b3: jax.Array
    n: int = static_field()
    real_per_tile: int = static_field(default=TILE)

    @property
    def ntiles(self) -> int:
        # a2, not a1: producers that fold a1 into their own gather
        # replace it with a 1-element dummy (gpr.pack_gpr)
        return int(self.a2.shape[0])


#: required ABI version of the native v3 entry (native/permute_router.cpp
#: v3_abi_version); a stale .so silently disables v3 instead of crashing
V3_ABI = 2


def _v3_router():
    """The native v3 routing entry (engine v3, see gpr.py) or None."""
    lib = _native_router()
    if lib is None or not hasattr(lib, "v3_route"):
        return None
    if not getattr(lib, "_v3_sig", False):
        if not hasattr(lib, "v3_abi_version"):
            return None
        lib.v3_abi_version.restype = _ctypes.c_int32
        lib.v3_abi_version.argtypes = []
        if int(lib.v3_abi_version()) != V3_ABI:
            return None
        I32 = _ctypes.POINTER(_ctypes.c_int32)
        I64 = _ctypes.POINTER(_ctypes.c_int64)
        lib.v3_route.restype = _ctypes.c_int64
        lib.v3_route.argtypes = [I32, I32, I64, I32, I32, I32, I64,
                                 I32, I32, I32,
                                 _ctypes.c_int64, _ctypes.c_int32, I32, I32]
        lib._v3_sig = True
    return lib


#: stage-2 row fill for engine-v3 packs: < 128 leaves the (exchange row,
#: 8-lane block) budget the slack that makes color-as-final-lane routing
#: feasible (full 128-element rows need a PERFECT 8-per-block spread —
#: though all-width-128 tiles route EXACTLY at any fill via the direct
#: Konig path, and the flow-redistribution repair recovers most mixed
#: tiles).  Feasibility is not monotonic in problem size (it depends on
#: tile fullness after the r_p search), so producers probe the LADDER in
#: order and take the first qcap that routes.  128 comes second: its row
#: budget is exactly v2's (always feasible when v2 is), which keeps
#: large chunks in the v3 game when 112 fails the budget (the 700k-nnz
#: power-law chunk, VERDICT r3).
V3_QCAP_LADDER = (112, 128, 96, 80)


class V3Infeasible(Exception):
    """Raised by :func:`plan_permutation` under ``v3_strict`` when the
    engine-v3 router finds no feasible coloring — BEFORE any (expensive)
    plane coloring, so qcap-ladder probes are cheap."""


def plan_permutation(perm: np.ndarray, *, slack: float = 0.15,
                     force_r_p: int | None = None,
                     host_planes: dict | None = None,
                     qcap: int = Q,
                     v3_meta: dict | None = None,
                     v3_strict: bool = False,
                     device: bool = True) -> PermutationPlan:
    """Route an arbitrary permutation of ``n`` elements.

    Elements are laid out ``slack``-padded: each tile carries
    ``r_p = TILE*(1-slack)`` real slots (rounded to whole 128-rows), the
    rest are self-mapped dummies — the headroom that keeps the
    rows-per-tile budget feasible for random flows.  ``apply_permutation``
    handles the (free) reshape/pad between the flat ``[n]`` view and the
    padded tile layout.

    ``force_r_p`` pins the tile fill (the two-level router engineers its
    pass flows for a specific ``r_p``; re-searching would break the
    contiguity that makes them feasible).

    ``host_planes``, when a dict, is filled with the HOST numpy planes
    (keys ``a1/a2/a3/rowsrc/b2/b3``; ``a3`` already b1-composed) so
    producers that fold engine stages into their own kernels (gpr's
    gather composes ``a1`` into its lane indices) never pull device
    arrays back through the tunnel.

    ``qcap`` caps elements per stage-2 row (< 128 buys engine-v3 routing
    slack); ``v3_meta`` (keys ``w_of_dst/row_of_dst/jcap_of_dst``, flat
    ``[N]`` per destination position, -1/0 on dummies) requests the
    color-as-final-lane routing: on success the plan's ``b3`` is a dummy,
    ``b2[c, r'] = r2`` routes the transposed product directly under the
    mask-dot (``host_planes['v3'] = True``, element placement under
    ``host_planes['v3_elem']``); on routing failure the plan silently
    falls back to the standard 5-plane form (``host_planes['v3'] =
    False``).  See gpr.py "engine v3" for the derivation.
    """
    perm = np.asarray(perm, dtype=np.int64)
    n = len(perm)
    idx = np.arange(n, dtype=np.int64)
    # entries with perm[i] < 0 are DON'T-CARE slots: they impose no
    # routing constraint (their outputs are garbage the caller discards).
    # Callers with dummy fill (gpr's slack slots) leave them at -1 — a
    # completed dummy mapping would add real cross-tile flows that blow
    # the row budget at scale (observed: one padded source tile fanning
    # out to every destination tile)
    real_mask = perm >= 0
    ridx = idx[real_mask]
    rperm = perm[real_mask]
    nr = len(ridx)

    # adaptive tile fill: search downward for an r_p whose EXACT row
    # budget (send and receive <= 128 whole rows per tile) is feasible.
    # r_p is kept a multiple of 1024 (8 whole sublanes) so consumers can
    # fuse sublane-granular producers into stage 1 (gpr's gather).
    r_p = None
    start = max((int(TILE * (1.0 - slack)) // 1024) * 1024, 1024)
    candidates = ([force_r_p] if force_r_p is not None
                  else range(start, Q - 1, -1024))
    if nr == 0:
        candidates = [force_r_p or start]
    def budget_at(cand, fill):
        """(T, send, recv) row-budget accounting at uniform ``fill``."""
        T_c = max(-(-n // cand), 1)
        ts_c = rperm // cand
        td_c = ridx // cand
        pair_c = ts_c * T_c + td_c
        # budget: rows = ceil(pair-chunk / fill) per (src, dst) tile pair
        # (bincount over the pair key; cheaper than unique's sort)
        cnt_all = np.bincount(pair_c, minlength=T_c * T_c) \
            if T_c * T_c <= max(4 * n, 1 << 20) else None
        if cnt_all is not None:
            nzp = np.flatnonzero(cnt_all)
            rows_per_pair = -(-cnt_all[nzp] // fill)
            send = np.bincount(nzp // T_c, weights=rows_per_pair,
                               minlength=T_c)
            recv = np.bincount(nzp % T_c, weights=rows_per_pair,
                               minlength=T_c)
        else:
            uniq, cnt = np.unique(pair_c, return_counts=True)
            rows_per_pair = -(-cnt // fill)
            send = np.bincount(uniq // T_c, weights=rows_per_pair,
                               minlength=T_c)
            recv = np.bincount(uniq % T_c, weights=rows_per_pair,
                               minlength=T_c)
        return T_c, send, recv

    # v3 requests (qcap < Q) use ADAPTIVE per-flow fill below: the search
    # may accept an r_p whose budget only closes at full Q fill — flows
    # on overloaded tiles then fill to Q while the rest keep the qcap
    # slack the router wants.  Pure-v2 planning keeps uniform qcap.
    adaptive = v3_meta is not None and qcap < Q
    for cand in candidates:
        if nr == 0:
            r_p = cand
            break
        T_c, send, recv = budget_at(cand, qcap)
        if send.max() <= Q and recv.max() <= Q:
            r_p = cand
            break
    if r_p is None and adaptive:
        # no fill is fully qcap-feasible: SECOND sweep accepting fills
        # that only close at Q — the per-flow adaptation below then keeps
        # qcap slack everywhere the budget allows.  A second sweep (not
        # an inline fallback) so any fully-qcap-feasible smaller r_p
        # always wins over a bigger r_p with full rows.
        for cand in candidates:
            T_c, send, recv = budget_at(cand, Q)
            if send.max() <= Q and recv.max() <= Q:
                r_p = cand
                break
    if r_p is None:
        raise ValueError(
            f"no feasible single-level routing for n={n}; use "
            f"plan_permutation_auto (two-level) or chunk below ~900k"
        )
    T = max(-(-n // r_p), 1)
    # padded-layout positions: element i lives at tile i//r_p, slot i%r_p
    # (real entries only — don't-care slots never route)
    ts_all, sp_all = np.divmod(rperm, r_p)   # src tile, slot within
    td_all, dp_all = np.divmod(ridx, r_p)    # dst tile, slot within

    # ---- stage-2 row assignment: chunk (ts -> td) flows into rows --------
    # order elements by (ts, td): chunks of <=128 become whole rows
    order = np.lexsort((td_all, ts_all))
    ts_o, td_o = ts_all[order], td_all[order]
    pair = ts_o * T + td_o
    new_pair = np.ones(nr, dtype=bool)
    new_pair[1:] = pair[1:] != pair[:-1]
    # position within its (ts, td) group
    grp_start = np.zeros(nr, dtype=np.int64)
    grp_start[new_pair] = np.flatnonzero(new_pair)
    grp_start = np.maximum.accumulate(grp_start)
    pos_in_grp = np.arange(nr) - grp_start
    grp_id = np.cumsum(new_pair) - 1 if nr else np.zeros(0, np.int64)
    ngrp = int(grp_id[-1]) + 1 if nr else 0
    # per-flow fill: qcap everywhere, raised to Q only for flows touching
    # tiles whose row budget overflows at qcap (adaptive v3 mode) — full
    # rows cost the router its block slack, so pay that price only where
    # the budget forces it.  Terminates: all-Q fill is the r_p search's
    # accepted accounting.
    fill_g = np.full(max(ngrp, 1), qcap, dtype=np.int64)
    if adaptive and nr:
        g_ts = ts_o[new_pair]
        g_td = td_o[new_pair]
        g_cnt = np.bincount(grp_id, minlength=ngrp)
        for _ in range(32):
            g_rows = -(-g_cnt // fill_g)
            send_c = np.bincount(g_ts, weights=g_rows, minlength=T)
            recv_c = np.bincount(g_td, weights=g_rows, minlength=T)
            over = (send_c > Q) | (recv_c > Q)
            if not over.any():
                break
            bump = (over[g_ts] | over[g_td]) & (fill_g < Q)
            if not bump.any():
                break
            fill_g[bump] = Q
    fill_e = fill_g[grp_id] if nr else np.zeros(0, np.int64)
    chunk = pos_in_grp // fill_e      # chunk index within group
    lane = pos_in_grp % fill_e
    # unique (pair, chunk) -> a stage-2 row
    ckey = pair * (2 * Q + 1) + np.minimum(chunk, 2 * Q)
    new_row = np.ones(nr, dtype=bool)
    new_row[1:] = ckey[1:] != ckey[:-1]
    row_id_of_elem = np.cumsum(new_row) - 1           # global packed row id
    nrows = int(row_id_of_elem[-1]) + 1 if nr else 0
    row_ts = ts_o[new_row]
    row_td = td_o[new_row]
    # per-tile row budgets
    send_counts = np.bincount(row_ts, minlength=T)
    recv_counts = np.bincount(row_td, minlength=T)
    if send_counts.max() > Q or recv_counts.max() > Q:
        raise ValueError(
            f"infeasible routing: a tile needs to send "
            f"{int(send_counts.max())} / receive {int(recv_counts.max())} "
            f"rows (> {Q}); use smaller permutation chunks"
        )
    # src row index within its source tile, dest row slot within dest tile
    def slot_within(owner):
        # rank of each row among rows sharing its owner, in row order
        # (vectorized group-by: stable sort, then arange minus group start)
        order_o = np.argsort(owner, kind="stable")
        counts = np.bincount(owner, minlength=T)
        gstart = np.zeros(T + 1, dtype=np.int64)
        np.cumsum(counts, out=gstart[1:])
        slots = np.empty(nrows, dtype=np.int64)
        slots[order_o] = np.arange(nrows) - gstart[owner[order_o]]
        return slots

    r1 = slot_within(row_ts)          # row within source tile after stage 1
    r2 = slot_within(row_td)          # row within dest tile after stage 2

    # ---- engine v3: color-as-final-lane routing (see docstring) ----------
    v3_ok = False
    row_id_eff = row_id_of_elem   # may be rewritten by v3 redistribution
    if v3_meta is not None and nr and T > 0:
        lib = _v3_router()
        if lib is not None:
            dst_pos = ridx[order]
            r2_e = r2[row_id_of_elem]
            vrow_e = (dst_pos % r_p) // Q
            mrow_e = v3_meta["row_of_dst"][dst_pos]
            W_e = v3_meta["w_of_dst"][dst_pos]
            jcap_e = v3_meta["jcap_of_dst"][dst_pos]
            # group elements by (tile, vals row, matrix row) -> dense rows
            key = (td_o * Q + vrow_e) * (np.int64(1) << 40) + mrow_e
            eorder = np.lexsort((key, td_o))
            ks = key[eorder]
            newr3 = np.r_[True, ks[1:] != ks[:-1]]
            grow = np.cumsum(newr3) - 1
            td_s = td_o[eorder]
            row_tile = td_s[newr3]
            eoff = np.zeros(T + 1, np.int64)
            np.cumsum(np.bincount(td_o, minlength=T), out=eoff[1:])
            roff = np.zeros(T + 1, np.int64)
            np.cumsum(np.bincount(row_tile, minlength=T), out=roff[1:])
            rowid_l = np.ascontiguousarray(
                (grow - roff[td_s]).astype(np.int32))
            rW = np.ascontiguousarray(W_e[eorder][newr3].astype(np.int32))
            rv = np.ascontiguousarray(
                vrow_e[eorder][newr3].astype(np.int32))
            rjc = np.ascontiguousarray(
                jcap_e[eorder][newr3].astype(np.int32))
            r2_s = np.ascontiguousarray(r2_e[eorder].astype(np.int32))
            # flow structure for cross-row redistribution: stage-2 rows
            # grouped by (td, ts); an element may ride any row of its
            # flow (stage 1 is a free within-tile permutation)
            frorder = np.lexsort((row_ts, row_td))
            fkey = row_td[frorder] * T + row_ts[frorder]
            newf = np.r_[True, fkey[1:] != fkey[:-1]]
            flow_sorted = np.cumsum(newf) - 1
            nflows = int(flow_sorted[-1]) + 1
            flow_of_row = np.empty(nrows, np.int64)
            flow_of_row[frorder] = flow_sorted
            frows_tab = np.ascontiguousarray(
                r2[frorder].astype(np.int32))
            frow_off = np.zeros(nflows + 1, np.int64)
            np.cumsum(np.bincount(flow_sorted, minlength=nflows),
                      out=frow_off[1:])
            frow_off = np.ascontiguousarray(frow_off.astype(np.int32))
            eflow = np.ascontiguousarray(
                flow_of_row[row_id_of_elem][eorder].astype(np.int32))
            v3lane = np.full(nr, -1, np.int32)
            v3er2 = np.full(nr, -1, np.int32)
            I32 = _ctypes.POINTER(_ctypes.c_int32)
            I64 = _ctypes.POINTER(_ctypes.c_int64)
            p32 = lambda a: a.ctypes.data_as(I32)
            p64 = lambda a: a.ctypes.data_as(I64)
            eoff_c = np.ascontiguousarray(eoff)
            roff_c = np.ascontiguousarray(roff)
            rc = lib.v3_route(p32(r2_s), p32(rowid_l), p64(eoff_c),
                              p32(rW), p32(rv), p32(rjc), p64(roff_c),
                              p32(eflow), p32(frow_off), p32(frows_tab),
                              T, 8, p32(v3lane), p32(v3er2))
            if rc == 0:
                # back to `order` element order
                lane_new = np.empty(nr, np.int64)
                lane_new[eorder] = v3lane
                lane = lane_new
                # redistribution may have moved elements to sibling rows
                # of their flow: adopt the router's per-element r2 and
                # remap each element to the row it now rides (same (ts,
                # td); r1 follows via the (td, r2) -> row lookup)
                r2_new = np.empty(nr, np.int64)
                r2_new[eorder] = v3er2
                rowid_by_td_r2 = np.full(T * Q, -1, np.int64)
                rowid_by_td_r2[row_td * Q + r2] = np.arange(nrows)
                row_id_eff = rowid_by_td_r2[td_o * Q + r2_new]
                assert row_id_eff.min() >= 0, "v3 er2 not a flow row"
                r2_e = r2_new
                v3_ok = True
                # b2[t, c, r'] = r2 of the element with final lane c and
                # vals row r'; unfilled slots read an r2 whose product is
                # exactly zero (no element of color c there, so vals_z is
                # zero — a full color has all 128 r' filled, so a free r2
                # always exists when needed)
                b2_v3 = np.zeros((T, Q, Q), np.int8)
                used_dst = np.zeros((T, Q, Q), bool)     # (t, c, r')
                used_src = np.zeros((T, Q, Q), bool)     # (t, c, r2)
                b2_v3[td_o, lane, vrow_e] = r2_e
                used_dst[td_o, lane, vrow_e] = True
                used_src[td_o, lane, r2_e] = True
                free_src = np.argmin(used_src, axis=2).astype(np.int8)
                b2_v3 = np.where(used_dst, b2_v3, free_src[:, :, None])
    if host_planes is not None:
        host_planes["v3"] = v3_ok
    if v3_meta is not None and v3_strict and not v3_ok:
        raise V3Infeasible(f"no feasible v3 coloring at qcap={qcap}")

    def fill_free_slots(perm_t, used_dst, tile_of, src_of):
        """Map each tile's leftover dst slots to its leftover src slots.

        Vectorized over all tiles at once: flatnonzero over the flattened
        [T, TILE] masks yields positions grouped by tile in ascending
        order on BOTH sides, and the per-tile counts agree (both are
        complements of the same per-tile element count), so pairing the
        two flat lists element-wise never crosses a tile boundary.
        """
        used_src = np.zeros((T, TILE), dtype=bool)
        used_src[tile_of, src_of] = True
        free_dst = np.flatnonzero(~used_dst.ravel())
        free_src = np.flatnonzero(~used_src.ravel())
        perm_t.ravel()[free_dst] = free_src % TILE

    # ---- stage-1 per-tile permutations -----------------------------------
    # element (in `order`) moves within src tile ts_o: from sp -> (r1, lane)
    sp_o = sp_all[order]
    # v3 redistribution may have moved elements between their flow's rows:
    # row_id_eff is the row each element actually rides (== row_id_of_elem
    # on the v2 path)
    dst1 = r1[row_id_eff] * Q + lane                  # target pos within tile
    # build full within-tile perms; unused slots self-map
    perm1 = np.tile(np.arange(TILE, dtype=np.int64), (T, 1))
    used = np.zeros((T, TILE), dtype=bool)
    perm1[ts_o, dst1] = sp_o
    used[ts_o, dst1] = True
    # unused slots must form a permutation too: map leftover dst slots to
    # leftover src slots (both are the complements, same count per tile)
    fill_free_slots(perm1, used, ts_o, sp_o)

    # ---- stage-2 global row sources --------------------------------------
    rowsrc = np.zeros(T * Q, dtype=np.int64)
    used_row = np.zeros(T * Q, dtype=bool)
    g_dst_row = row_td * Q + r2
    g_src_row = row_ts * Q + r1
    rowsrc[g_dst_row] = g_src_row
    used_row[g_dst_row] = True
    rowsrc[~used_row] = np.flatnonzero(~used_row)     # idle rows self-map

    # ---- stage-3 per-tile permutations -----------------------------------
    # element now at (r2, lane) within dst tile td_o; must reach dp.
    # (v3 plans have no stage-3 permutation: the arrival lane IS the final
    # color, b2 was built above, and the transposed mask-dot replaces the
    # final transpose + b3 gather)
    if not v3_ok:
        src3 = r2[row_id_of_elem] * Q + lane
        perm3 = np.tile(np.arange(TILE, dtype=np.int64), (T, 1))
        used3 = np.zeros((T, TILE), dtype=bool)
        dp_o = dp_all[order]
        perm3[td_o, dp_o] = src3
        used3[td_o, dp_o] = True
        fill_free_slots(perm3, used3, td_o, src3)

    # ---- per-tile G-T-G-T-G planes (batched coloring + vectorized
    # plane assembly: one C++ call for all tiles, OpenMP inside) ----------
    def planes_for(perms):
        dst_r = np.broadcast_to(
            (np.arange(TILE, dtype=np.int64) // Q)[None], (T, TILE))
        dst_c = np.broadcast_to(
            (np.arange(TILE, dtype=np.int64) % Q)[None], (T, TILE))
        src_r, src_c = np.divmod(perms, Q)
        colors = color_bipartite_tiles(src_r, dst_r)
        g1 = np.zeros((T, Q, Q), dtype=np.int32)
        g2 = np.zeros((T, Q, Q), dtype=np.int32)
        g3 = np.zeros((T, Q, Q), dtype=np.int32)
        tile_i = np.broadcast_to(
            np.arange(T, dtype=np.int64)[:, None], (T, TILE))
        g1[tile_i, src_r, colors] = src_c
        g2[tile_i, colors, dst_r] = src_r
        g3[tile_i, dst_r, dst_c] = colors
        return g1, g2, g3

    a1, a2, a3 = planes_for(perm1)
    if v3_ok:
        # stage 1 already lands every element at its final color lane
        # (dst1 used the v3 lane), so there is no b1 to fold and no b3;
        # b2 is the direct (color, vals-row) -> r2 map built above
        b2, b3 = b2_v3, np.zeros((1, 1, 1), np.int8)
    else:
        b1, b2, b3 = planes_for(perm3)
        # fold stage 3's leading lane-gather (b1) into stage 1's trailing
        # one (a3): stage 2 moves WHOLE rows (dest row u*Q+r reads source
        # row rowsrc[u*Q+r] wholesale), so the per-dest-row lane
        # permutation b1 can be pre-applied to the source row before the
        # exchange.  Each used source row has exactly ONE real consumer
        # (g_src_row is injective); idle dest rows' self-reads may alias
        # used source rows, but their outputs are don't-care slots, so
        # only the real consumer's b1 matters.  The source row t*Q+s
        # leaves stage 1 pre-gathered by beta = b1[dest_of[t*Q+s]]:
        #   out'[s, c] = out[s, beta[c]] = z4[s, a3[s, beta[c]]]
        dest_of = np.arange(T * Q, dtype=np.int64)
        dest_of[g_src_row] = g_dst_row
        beta = b1.reshape(T * Q, Q)[dest_of].astype(np.int64)
        a3 = np.take_along_axis(
            a3.reshape(T * Q, Q), beta, axis=1).reshape(T, Q, Q)
    if host_planes is not None:
        host_planes.update(a1=a1, a2=a2, a3=a3, rowsrc=rowsrc,
                           b2=b2, b3=b3)
        if v3_ok:
            # element placement for the producer's vals scatter / y plan:
            # element at flat dst position dst_pos sits at (tile td,
            # exchange row r2, final lane) when the kernel multiplies
            host_planes["v3_elem"] = dict(
                dst_pos=ridx[order], td=td_o,
                r2=r2[row_id_eff], lane=lane)
    # index planes hold lane/sublane/color ids < 128 → int8 halves their
    # HBM traffic (they are the bulk of an engine pass's bytes); kernels
    # upcast per tile in VMEM.  ONE batched device_put for all six
    # planes (per-array transfers pay a ~6-15 ms tunnel round-trip EACH
    # on first contact — measured pack cold-start, round 5); callers
    # that defer the upload entirely (gpr's chunked pack device_puts
    # the whole GPCSRChunked pytree once) pass device=False and get
    # numpy leaves.
    out = PermutationPlan(
        a1=a1.astype(np.int8), a2=a2.astype(np.int8), a3=a3.astype(np.int8),
        rowsrc=rowsrc.astype(np.int32),
        b2=b2.astype(np.int8), b3=b3.astype(np.int8),
        n=int(n),
        real_per_tile=int(r_p),
    )
    return jax.device_put(out) if device else out


@sparse_dataclass
class TwoLevelPlan:
    """Two-pass routing: arbitrary ``n`` via supertile composition.

    Single-level routing caps near ~900k elements: a tile sending its
    ``r_p`` elements needs at least ``r_p/128`` whole rows, and the
    per-destination-tile fragmentation (+1 partial row per flow) eats the
    slack once there are more destination tiles than slack rows.  The
    classic fix is one more Clos stage, one level up:

    - **pass A** routes every element into its destination *supertile*
      (group of ``K`` tiles), at a slot chosen so that each (source tile →
      supertile) flow lands **contiguously** — then a source tile
      fragments across at most ``T/K (+1)`` destinations, which fits the
      slack;
    - **pass B** finishes within each supertile independently — flows
      never leave a ``K``-tile group, so the per-tile budget sees at most
      ``K - 1`` peers.

    Cost: exactly 2x one engine pass (measured 6.8 Gval/s single-level).
    """

    plan_a: PermutationPlan
    plan_b: PermutationPlan
    n: int = static_field()


def _rows_feasible(p: np.ndarray, idx: np.ndarray, r_p: int, T: int) -> bool:
    """Cheap pre-check of the per-tile send/recv row budgets (the same
    accounting plan_permutation enforces).  Don't-care entries (< 0) are
    unconstrained and excluded."""
    m = p >= 0
    pair = (p[m] // r_p) * T + idx[m] // r_p
    uniq, cnt = np.unique(pair, return_counts=True)
    rows = -(-cnt // Q)
    send = np.bincount(uniq // T, weights=rows, minlength=T)
    recv = np.bincount(uniq % T, weights=rows, minlength=T)
    return send.max() <= Q and recv.max() <= Q


def plan_permutation_two_level(perm: np.ndarray, *,
                               device: bool = True) -> TwoLevelPlan:
    """Budget arithmetic (rows per tile, cap 128; floor = r_p/128):

    - pass A's flows are contiguous by construction → ~2 partial rows per
      supertile, i.e. ~2·T/K;
    - pass B's fragmentation depends on the permutation's structure
      (random: ~K/2 rows; structured flows with dummy fill can be worse),
      so the slack is chosen ADAPTIVELY: the cheap budget pre-check walks
      slack ∈ {0.30, 0.40, 0.50} and plans at the first feasible level.

    At slack 0.30 (r_p 11392, floor 89) with K=56 random flows fit up to
    T ≈ 1100 → n ≈ 12M; heavier structure costs more padding, not failure.
    """
    perm = np.asarray(perm, dtype=np.int64)
    n = len(perm)
    idx = np.arange(n, dtype=np.int64)
    last_err = None
    for slack in (0.30, 0.40, 0.50):
        r_p = max((int(TILE * (1.0 - slack)) // 1024) * 1024, 1024)
        T = max(-(-n // r_p), 1)
        K = min(56, T)
        real = perm >= 0
        ridx = idx[real]
        S_of = (ridx // r_p) // K              # destination supertile
        ts = perm[real] // r_p                 # source tile
        # contiguous q assignment: group by supertile (count <= slot
        # capacity, real entries pack the group's leading slots), order
        # flows by source tile, ties by DESTINATION position — then pass
        # B's (mid-tile -> dst-tile) flows are contiguous runs too.
        # Don't-care entries never route in either pass.
        order = np.lexsort((ridx, ts, S_of))
        sorted_S = S_of[order]
        newg = np.ones(len(order), dtype=bool)
        newg[1:] = sorted_S[1:] != sorted_S[:-1]
        gstart = np.zeros(len(order), dtype=np.int64)
        gstart[newg] = np.flatnonzero(newg)
        gstart = np.maximum.accumulate(gstart)
        rank = np.arange(len(order)) - gstart
        q = sorted_S * (K * r_p) + rank        # slot within the supertile
        perm_a = np.full(n, -1, dtype=np.int64)
        perm_a[q] = perm[real][order]          # mid[q] = x[perm_a[q]]
        perm_b = np.full(n, -1, dtype=np.int64)
        perm_b[ridx[order]] = q                # out[i] = mid[perm_b[i]]
        if not (_rows_feasible(perm_a, idx, r_p, T)
                and _rows_feasible(perm_b, idx, r_p, T)):
            last_err = ValueError(
                f"two-level routing infeasible at slack {slack} for n={n}"
            )
            continue
        plan_a = plan_permutation(perm_a, slack=slack, force_r_p=r_p,
                                  device=device)
        plan_b = plan_permutation(perm_b, slack=slack, force_r_p=r_p,
                                  device=device)
        return TwoLevelPlan(plan_a=plan_a, plan_b=plan_b, n=n)
    raise last_err


def plan_permutation_auto(perm: np.ndarray, *, slack: float = 0.15,
                          host_planes: dict | None = None,
                          two_level: bool = True,
                          qcap: int = Q,
                          v3_meta: dict | None = None,
                          v3_strict: bool = False,
                          device: bool = True):
    """Single-level when feasible (one engine pass), two-level beyond the
    ~900k cap.  Returns ``PermutationPlan`` or ``TwoLevelPlan``; both are
    accepted by :func:`apply_permutation`.  ``host_planes`` is filled
    only on the single-level path (two-level passes cannot be fused into
    a producer's gather).  ``two_level=False`` raises instead of falling
    back — the cheap escape hatch for callers (gpr's adaptive chunker)
    that would rather split the problem than pay two-level routing, as
    the single-level feasibility search fails BEFORE any coloring."""
    perm = np.asarray(perm, dtype=np.int64)
    if len(perm) > 1_600_000:
        if not two_level:
            raise ValueError(f"n={len(perm)} needs two-level routing")
        if v3_meta is not None and v3_strict:
            # two-level passes cannot carry the v3 coloring: honor the
            # documented fail-fast contract instead of silently
            # returning a TwoLevelPlan with empty host_planes
            raise V3Infeasible(f"n={len(perm)} needs two-level routing; "
                               "v3 is single-level only")
        if host_planes is not None:
            host_planes["v3"] = False
        # single-level is infeasible for random flows well before this;
        # skip the (expensive) downward feasibility search entirely
        return plan_permutation_two_level(perm, device=device)
    try:
        return plan_permutation(perm, slack=slack, host_planes=host_planes,
                                qcap=qcap, v3_meta=v3_meta,
                                v3_strict=v3_strict, device=device)
    except ValueError:
        if not two_level:
            raise
        # two-level needs its own (larger) slack budget — see its docstring
        return plan_permutation_two_level(perm, device=device)


def _gtgtg(z, g1, g2, g3):
    """The 3-gather-2-transpose tile permutation (planes arrive int8)."""
    z = jnp.take_along_axis(z, g1.astype(jnp.int32), axis=1)
    return _tgtg(z, g2, g3)


def _tgtg(z, g2, g3):
    """Stage-3 tile permutation after the b1 fold: transpose, sublane
    route (as a lane-gather in transposed space), transpose, place."""
    z = z.T
    z = jnp.take_along_axis(z, g2.astype(jnp.int32), axis=1)
    z = z.T
    return jnp.take_along_axis(z, g3.astype(jnp.int32), axis=1)


def _stage1_kernel(x_ref, g1_ref, g2_ref, g3_ref, o_ref):
    o_ref[0] = _gtgtg(x_ref[0], g1_ref[0], g2_ref[0], g3_ref[0])


def _stage23_kernel(rowsrc_ref, z_ref, g2_ref, g3_ref, o_ref):
    t = pl.program_id(0)

    def stack8(s):
        base = t * Q + s * 8
        return jnp.stack([z_ref[rowsrc_ref[base + i], :] for i in range(8)])

    z = jnp.concatenate([stack8(s) for s in range(Q // 8)], axis=0)
    o_ref[0] = _tgtg(z, g2_ref[0], g3_ref[0])


def _tile_spec():
    return pl.BlockSpec((1, Q, Q), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)


def apply_stage23_flat(plan: PermutationPlan, z: jax.Array, *,
                       interpret: bool = False) -> jax.Array:
    """Stages 2+3 (row exchange + per-destination-tile placement) on a
    stage-1 output ``z [T*Q, Q]`` → flat ``[plan.n]``.

    Exposed so producers that fuse their own work into stage 1 (the GPR
    gather) can hand over mid-pipeline."""
    T = plan.ntiles
    r_p = plan.real_per_tile
    out = pl.pallas_call(
        _stage23_kernel,
        out_shape=jax.ShapeDtypeStruct((T, Q, Q), z.dtype),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # rowsrc (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),        # z (full, rows)
            _tile_spec(), _tile_spec(),
        ],
        out_specs=_tile_spec(),
        interpret=interpret,
    )(plan.rowsrc, z, plan.b2, plan.b3)
    return out.reshape(T, TILE)[:, :r_p].reshape(-1)[: plan.n]


#: rhs per stage-1 grid step / tiles per stage-2+3 grid step: fat blocks
#: keep the (batch x tiles) grids near the unbatched step count — a grid
#: of nrhs*T skinny steps pays the ~1-2us/step fixed cost 32x over
QB_S1 = 8
TB_S23 = 8


def _stage1_batched_kernel(x_ref, g1_ref, g2_ref, g3_ref, o_ref):
    for q2 in range(x_ref.shape[0]):
        o_ref[q2, 0] = _gtgtg(x_ref[q2, 0], g1_ref[0], g2_ref[0],
                              g3_ref[0])


def _stage23_batched_kernel(rowsrc_ref, z_ref, g2_ref, g3_ref,
                            o_ref, *, tb):
    t0 = pl.program_id(1) * tb
    for i in range(tb):

        def stack8(s, i=i):
            base = (t0 + i) * Q + s * 8
            return jnp.stack([z_ref[0, rowsrc_ref[base + j], :]
                              for j in range(8)])

        z = jnp.concatenate([stack8(s) for s in range(Q // 8)], axis=0)
        o_ref[0, i] = _tgtg(z, g2_ref[i], g3_ref[i])


def apply_permutation_batched(plan, X: jax.Array, *,
                              interpret: bool = False) -> jax.Array:
    """Apply one routed permutation to a BATCH: ``X [nrhs, plan.n]`` →
    same shape, each row permuted identically.

    The batch dimension leads the grid with the tile dimension minor, so
    each rhs's stage-2 exchange buffer stays VMEM-resident across its
    tile sweep while the (int8) planes cycle — the index/plane traffic of
    one pass amortizes across the batch far better than ``lax.map`` over
    per-rhs applies (which also pays the launch fixed cost per rhs).
    Used by the SpMM pipelines.
    """
    if isinstance(plan, TwoLevelPlan):
        mid = apply_permutation_batched(plan.plan_a, X, interpret=interpret)
        return apply_permutation_batched(plan.plan_b, mid,
                                         interpret=interpret)
    nrhs = int(X.shape[0])
    T = plan.ntiles
    r_p = plan.real_per_tile
    Xf = X
    if T * r_p != plan.n:
        Xf = jnp.pad(Xf, ((0, 0), (0, T * r_p - plan.n)))
    x4 = Xf.reshape(nrhs, T, r_p)
    if r_p != TILE:
        x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, TILE - r_p)))
    x4 = x4.reshape(nrhs, T, Q, Q)
    qb = min(QB_S1, nrhs)
    nq = -(-nrhs // qb)
    if nq * qb != nrhs:
        x4 = jnp.pad(x4, ((0, nq * qb - nrhs), (0, 0), (0, 0), (0, 0)))
    t_plane = pl.BlockSpec((1, Q, Q), lambda qg, t: (t, 0, 0),
                           memory_space=pltpu.VMEM)
    z = pl.pallas_call(
        _stage1_batched_kernel,
        out_shape=jax.ShapeDtypeStruct((nq * qb, T, Q, Q), x4.dtype),
        grid=(nq, T),
        in_specs=[
            pl.BlockSpec((qb, 1, Q, Q), lambda qg, t: (qg, t, 0, 0),
                         memory_space=pltpu.VMEM),
            t_plane, t_plane, t_plane,
        ],
        out_specs=pl.BlockSpec((qb, 1, Q, Q), lambda qg, t: (qg, t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x4, plan.a1, plan.a2, plan.a3)[:nrhs]
    return apply_stage23_flat_batched(plan, z.reshape(nrhs, T * Q, Q),
                                      interpret=interpret)


def apply_stage23_flat_batched(plan: PermutationPlan, z: jax.Array, *,
                               interpret: bool = False) -> jax.Array:
    """Batched stages 2+3: ``z [nrhs, T*Q, Q]`` → flat ``[nrhs, plan.n]``.
    Each rhs's exchange buffer is VMEM-resident across its tile sweep
    (envelope: ``T*Q*Q*4*2 <= ~12 MB`` → T up to ~140 tiles); tiles run
    ``TB_S23`` per grid step so the step count stays near the unbatched
    pass's."""
    nrhs = int(z.shape[0])
    T = plan.ntiles
    r_p = plan.real_per_tile
    tb = min(TB_S23, T)
    nt = -(-T // tb)
    Tp = nt * tb
    b2, b3, rowsrc, zp = plan.b2, plan.b3, plan.rowsrc, z
    if Tp != T:
        pad_t = ((0, Tp - T), (0, 0), (0, 0))
        b2, b3 = (jnp.pad(b, pad_t) for b in (b2, b3))
        # padded tiles self-read row 0 (harmless: output sliced away)
        rowsrc = jnp.pad(rowsrc, (0, (Tp - T) * Q))
    out = pl.pallas_call(
        _functools.partial(_stage23_batched_kernel, tb=tb),
        out_shape=jax.ShapeDtypeStruct((nrhs, Tp, Q, Q), z.dtype),
        grid=(nrhs, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # rowsrc
            pl.BlockSpec((1, T * Q, Q), lambda q, tg: (q, 0, 0),
                         memory_space=pltpu.VMEM),           # z, per-q
            pl.BlockSpec((tb, Q, Q), lambda q, tg: (tg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, Q, Q), lambda q, tg: (tg, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb, Q, Q), lambda q, tg: (q, tg, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rowsrc, zp, b2, b3)
    return out[:, :T].reshape(nrhs, T, TILE)[:, :, :r_p].reshape(
        nrhs, -1)[:, : plan.n]


def apply_permutation(plan, x, *, interpret: bool = False):
    """Apply a routed permutation to ``x`` (flat length ``plan.n``).

    Accepts a :class:`PermutationPlan` or a :class:`TwoLevelPlan` (two
    chained engine passes)."""
    if isinstance(plan, TwoLevelPlan):
        mid = apply_permutation(plan.plan_a, jnp.reshape(x, (-1,)),
                                interpret=interpret)
        out = apply_permutation(plan.plan_b, mid, interpret=interpret)
        return out.reshape(jnp.shape(x))
    T = plan.ntiles
    r_p = plan.real_per_tile
    xf = jnp.reshape(x, (-1,))
    if T * r_p != plan.n:
        xf = jnp.pad(xf, (0, T * r_p - plan.n))
    x2 = xf.reshape(T, r_p)
    if r_p != TILE:
        x2 = jnp.pad(x2, ((0, 0), (0, TILE - r_p)))
    x2 = x2.reshape(T, Q, Q)
    z = pl.pallas_call(
        _stage1_kernel,
        out_shape=jax.ShapeDtypeStruct((T, Q, Q), x2.dtype),
        grid=(T,),
        in_specs=[_tile_spec()] * 4,
        out_specs=_tile_spec(),
        interpret=interpret,
    )(x2, plan.a1, plan.a2, plan.a3)
    flat = apply_stage23_flat(plan, z.reshape(T * Q, Q),
                              interpret=interpret)
    return flat.reshape(jnp.shape(x))
