#!/usr/bin/env python
"""Prototype: engine-v3 color-as-final-lane routing feasibility.

v3 drops stage-3's final transpose + gather by making each element's
b-coloring color BE its final lane; the mask-dot then reads the
[color, vals-row] layout directly (see tools/probe_engine_v3.py).  The
cost: colors are constrained to the element's matrix row's 8-lane blocks,
which requires (a) assigning each matrix row a j-slot inside its vals row
(block set = [j*W/8, (j+1)*W/8)), (b) distributing row entries across its
blocks, both such that every (exchange row, block) carries <= 8 elements,
then (c) a proper <=8-coloring per (tile, block) — exact by König.

This prototype runs (a)+(b) greedy + (c) via the existing router on the
REAL layouts of the bench matrices (uniform 700k-nnz, power-law) and
reports feasibility; correctness is asserted by constraint checks.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.sparse as sp

from tpu_spmv.kernels import permute as pm
from tpu_spmv.kernels.gpr import CLASS_W, LANES

Q = 128


def log(*a):
    print(*a, flush=True)


QCAP = 112        # elements per stage-2 row for v3 packs (< 128: the
                  # (r2, block) capacity slack that makes routing feasible;
                  # row-count cost ~14% of the exchange, ~25ns/tile)


def layout_elements(csr):
    """Replicate pack_gpr's class layout + plan_permutation's stage-2 row
    assignment, returning per-element routing inputs.

    Returns dict with per-element arrays (in stage-2 `order`): r2 row slot
    within dest tile, dest plan tile, vals row within tile, matrix row id,
    class width; plus r_p.
    """
    csr = csr.tocsr()
    csr.sort_indices()
    indptr = np.asarray(csr.indptr, np.int64)
    cols = np.asarray(csr.indices, np.int64)
    nrow, ncol = csr.shape
    nnz = len(cols)
    counts = np.diff(indptr)
    assert counts.max() <= LANES, "prototype: no hub splitting"
    row_ids = np.repeat(np.arange(nrow, dtype=np.int64), counts)

    cls = np.minimum(np.searchsorted(CLASS_W, counts), len(CLASS_W) - 1)
    row_order = np.argsort(cls, kind="stable")
    sorted_pos = np.empty(nrow, np.int64)
    sorted_pos[row_order] = np.arange(nrow)
    rows_per_class = np.bincount(cls, minlength=len(CLASS_W))
    cstart = np.zeros(len(CLASS_W) + 1, np.int64)
    np.cumsum(rows_per_class, out=cstart[1:])

    tile_base = np.zeros(len(CLASS_W), np.int64)
    Ttot = 0
    for c, W in enumerate(CLASS_W):
        rows_c = int(rows_per_class[c])
        k_c = LANES // W
        T_c = -(-rows_c // (8 * k_c)) if rows_c else 0
        tile_base[c] = Ttot
        Ttot += T_c
    Ttot = max(Ttot, 1)

    offs = np.arange(nnz, dtype=np.int64) - indptr[row_ids]
    e_cls = cls[row_ids]
    W_e = np.asarray(CLASS_W)[e_cls]
    k_e = LANES // W_e
    lr = sorted_pos[row_ids] - cstart[e_cls]
    d_lane = (lr % k_e) * W_e + offs
    d_sub = (lr // k_e) % 8
    d_tile = tile_base[e_cls] + lr // (8 * k_e)
    dst_flat = (d_tile * 8 + d_sub) * LANES + d_lane

    # gather-side src (segment-grouped) — same as pack_gpr
    seg_order = np.argsort(cols >> 7, kind="stable")
    seg_sorted = (cols >> 7)[seg_order]
    new_seg = np.ones(nnz, bool)
    new_seg[1:] = seg_sorted[1:] != seg_sorted[:-1]
    run_start = np.maximum.accumulate(np.where(new_seg, np.arange(nnz), 0))
    pos_in_seg = np.arange(nnz) - run_start
    glane = pos_in_seg % LANES
    gsub = np.cumsum(new_seg | (pos_in_seg % LANES == 0)) - 1
    NS8 = -(-(int(gsub[-1]) + 1) // 8) * 8

    N = max(NS8 * LANES, Ttot * 8 * LANES)
    src_flat = gsub * LANES + glane
    perm = np.full(N, -1, np.int64)
    perm[dst_flat[seg_order]] = src_flat

    # ---- plan_permutation's stage-2 machinery (single-level, r_p search)
    idx = np.arange(N, dtype=np.int64)
    real = perm >= 0
    ridx = idx[real]
    rperm = perm[real]
    start = max((int(pm.TILE * 0.85) // 1024) * 1024, 1024)
    r_p = None
    for cand in range(start, Q - 1, -1024):
        T_c = max(-(-N // cand), 1)
        pair = (rperm // cand) * T_c + ridx // cand
        cnt = np.bincount(pair, minlength=T_c * T_c)
        nzp = np.flatnonzero(cnt)
        rows_per_pair = -(-cnt[nzp] // QCAP)
        send = np.bincount(nzp // T_c, weights=rows_per_pair, minlength=T_c)
        recv = np.bincount(nzp % T_c, weights=rows_per_pair, minlength=T_c)
        if send.max() <= Q and recv.max() <= Q:
            r_p = cand
            break
    assert r_p is not None, "needs two-level; prototype skips"
    T = max(-(-N // r_p), 1)
    ts_all = rperm // r_p
    td_all, dp_all = np.divmod(ridx, r_p)
    order = np.lexsort((td_all, ts_all))
    ts_o, td_o = ts_all[order], td_all[order]
    pair = ts_o * T + td_o
    new_pair = np.ones(len(order), bool)
    new_pair[1:] = pair[1:] != pair[:-1]
    grp_start = np.zeros(len(order), np.int64)
    grp_start[new_pair] = np.flatnonzero(new_pair)
    grp_start = np.maximum.accumulate(grp_start)
    pos_in_grp = np.arange(len(order)) - grp_start
    chunk = pos_in_grp // QCAP
    ckey = pair * (2 * Q + 1) + np.minimum(chunk, 2 * Q)
    new_row = np.ones(len(order), bool)
    new_row[1:] = ckey[1:] != ckey[:-1]
    row_id_of_elem = np.cumsum(new_row) - 1
    row_ts = ts_o[new_row]
    row_td = td_o[new_row]
    nrows2 = int(row_id_of_elem[-1]) + 1

    def slot_within(owner):
        order_o = np.argsort(owner, kind="stable")
        counts_o = np.bincount(owner, minlength=T)
        gstart = np.zeros(T + 1, np.int64)
        np.cumsum(counts_o, out=gstart[1:])
        slots = np.empty(nrows2, np.int64)
        slots[order_o] = np.arange(nrows2) - gstart[owner[order_o]]
        return slots

    r2 = slot_within(row_td)[row_id_of_elem]      # exchange-row slot
    # element identity back through the two sorts: elements in `order`
    # refer to flat dst positions ridx[order]; invert dst_flat -> element
    einv = np.empty(N, np.int64)
    einv[dst_flat[seg_order]] = seg_order
    elem = einv[ridx[order]]                      # original element id
    rp128 = r_p // Q
    return dict(
        r2=r2, td=td_o, vrow=(dp_all[order] % r_p) // Q,
        mrow=row_ids[elem], W=W_e[elem], T=T, rp128=rp128, nnz=nnz,
    )


def assign_blocks(L):
    """Greedy (a)+(b): per dest tile, j-slots + entry->block distribution.

    Returns (block per element, n_overloaded) — overload > 0 means v3
    infeasible for that tile without repair."""
    T, rp128 = L["T"], L["rp128"]
    r2, td, vrow, mrow, W = (L[k] for k in ("r2", "td", "vrow", "mrow", "W"))
    nb = 16
    block = np.full(len(r2), -1, np.int64)
    total_overload = 0
    t0 = time.time()
    for t in range(T):
        sel = np.flatnonzero(td == t)
        if not len(sel):
            continue
        load = np.zeros((Q, nb), np.int64)        # (r2, block)
        # group elements by matrix row (rows are tile-local here: a matrix
        # row's elements land in ONE (tile, vals row) in this layout)
        key = vrow[sel] * (1 << 40) + mrow[sel]
        row_sort = np.argsort(key, kind="stable")
        ks = key[row_sort]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        ends = np.r_[starts[1:], len(ks)]
        # row metadata
        rows = []
        for s, e in zip(starts, ends):
            eids = sel[row_sort[s:e]]
            rows.append((int(W[eids[0]]), int(vrow[eids[0]]), eids))
        # vals-row slot bookkeeping: nb8 = W/8 blocks per slot, k slots
        free_j = {}
        for Wr, v, eids in rows:
            free_j.setdefault(v, list(range(LANES // Wr)))
        # most-constrained first: rows with the most in-tile elements
        rows.sort(key=lambda it: -len(it[2]))
        for Wr, v, eids in rows:
            nbr = Wr // 8                          # blocks per row
            cands = free_j[v]
            prof = np.bincount(r2[eids], minlength=Q)
            nz = np.flatnonzero(prof)
            best, best_cost = None, None
            for j in cands:
                bset = range(j * nbr, (j + 1) * nbr)
                cost = 0
                bal = 0
                for rr in nz:
                    c = int(prof[rr])
                    room = sorted((int(load[rr, b]) for b in bset))
                    # fill emptiest blocks first, cap 8 per (row, block)
                    for b_load in room:
                        take = min(8 - b_load, 8, c)
                        if take > 0:
                            c -= take
                            # quadratic pressure keeps cells balanced long
                            # before they overflow
                            bal += (b_load + take) ** 2 - b_load ** 2
                    cost += 1000 * c               # entries with no room
                cost += bal
                if best_cost is None or cost < best_cost:
                    best, best_cost = j, cost
            j = best
            free_j[v].remove(j)
            total_overload += best_cost // 1000
            # commit distribution
            bset = list(range(j * nbr, (j + 1) * nbr))
            for rr in nz:
                c = int(prof[rr])
                eids_r = eids[r2[eids] == rr]
                k = 0
                for b in sorted(bset, key=lambda b: load[rr, b]):
                    take = min(8 - int(load[rr, b]), c)
                    take = max(take, 0)
                    if k + take > len(eids_r):
                        take = len(eids_r) - k
                    if take <= 0:
                        continue
                    block[eids_r[k:k + take]] = b
                    load[rr, b] += take
                    k += take
                    c -= take
                # overflow: dump remaining in the least-loaded block
                if k < len(eids_r):
                    b = min(bset, key=lambda b: load[rr, b])
                    block[eids_r[k:]] = b
                    load[rr, b] += len(eids_r) - k
    log(f"assign_blocks: {time.time() - t0:.1f}s, overload={total_overload}")
    return block, total_overload


def _distribute(eids, r2, bset, load, block):
    """Greedily place eids' entries into bset (<=8 per (r2, block) soft);
    returns overflow count."""
    over = 0
    prof = {}
    for e in eids:
        prof.setdefault(int(r2[e]), []).append(e)
    for rr, es in prof.items():
        k = 0
        for b in sorted(bset, key=lambda b: load[rr, b]):
            take = min(max(8 - int(load[rr, b]), 0), len(es) - k)
            for e in es[k:k + take]:
                block[e] = b
            load[rr, b] += take
            k += take
            if k == len(es):
                break
        if k < len(es):
            b = min(bset, key=lambda b: load[rr, b])
            for e in es[k:]:
                block[e] = b
            load[rr, b] += len(es) - k
            over += len(es) - k
    return over


def repair(L, block, sweeps=6):
    """2-opt repair: move/swap j-slots of rows contributing to overloaded
    (r2, block) cells.  Returns residual overload."""
    T = L["T"]
    r2, td, vrow, mrow, W = (L[k] for k in ("r2", "td", "vrow", "mrow", "W"))
    t0 = time.time()
    residual = 0
    for t in range(T):
        sel = np.flatnonzero(td == t)
        if not len(sel):
            continue
        load = np.zeros((Q, 16), np.int64)
        np.add.at(load, (r2[sel], block[sel]), 1)

        # row bookkeeping: rows keyed by (vrow, mrow); j = block set anchor
        key = vrow[sel] * (1 << 40) + mrow[sel]
        row_sort = np.argsort(key, kind="stable")
        ks = key[row_sort]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        ends = np.r_[starts[1:], len(ks)]
        rows = []
        for s, e in zip(starts, ends):
            eids = sel[row_sort[s:e]]
            Wr = int(W[eids[0]])
            nbr = Wr // 8
            j = int(block[eids[0]]) // nbr
            rows.append([Wr, int(vrow[eids[0]]), j, eids])
        by_v = {}
        for i, (_, v, j, _) in enumerate(rows):
            by_v.setdefault(v, []).append(i)

        def unplace(i):
            Wr, v, j, eids = rows[i]
            np.add.at(load, (r2[eids], block[eids]), -1)

        def place(i, j):
            Wr, v, _, eids = rows[i]
            nbr = Wr // 8
            rows[i][2] = j
            return _distribute(eids, r2, list(range(j * nbr, (j + 1) * nbr)),
                               load, block)

        def overflow_total():
            return int(np.maximum(load - 8, 0).sum())

        for _ in range(sweeps):
            if overflow_total() == 0:
                break
            bad = np.argwhere(load > 8)
            improved = False
            for rr, b in bad:
                if load[rr, b] <= 8:
                    continue
                # rows with elements in this cell
                cand = [i for i in range(len(rows))
                        if (block[rows[i][3]] == b).any()
                        and (r2[rows[i][3]] == rr).any()]
                cand.sort(key=lambda i: len(rows[i][3]))
                for i in cand:
                    Wr, v, j_cur, eids = rows[i]
                    nbr = Wr // 8
                    used_j = {rows[x][2] for x in by_v[v] if x != i}
                    free = [j for j in range(Q // Wr)
                            if j not in used_j and j != j_cur]
                    before = overflow_total()
                    # (a) move to a free slot
                    done = False
                    for j_new in free:
                        unplace(i)
                        place(i, j_new)
                        if overflow_total() < before:
                            improved = done = True
                            break
                        unplace(i)
                        place(i, j_cur)
                    if done:
                        break
                    # (b) swap with a sibling row in the same vals row
                    for x in by_v[v]:
                        if x == i or rows[x][0] != Wr:
                            continue
                        j_x = rows[x][2]
                        unplace(i)
                        unplace(x)
                        place(i, j_x)
                        place(x, j_cur)
                        if overflow_total() < before:
                            improved = done = True
                            break
                        unplace(i)
                        unplace(x)
                        place(i, j_cur)
                        place(x, j_x)
                    if done:
                        break
            if not improved:
                break
        residual += overflow_total()
    log(f"repair: {time.time() - t0:.1f}s, residual={residual}")
    return residual


def color_blocks(L, block):
    """(c): per (tile, block) proper <=8-coloring via the batch router."""
    r2, td, vrow = L["r2"], L["td"], L["vrow"]
    key = td * 16 + block
    order = np.argsort(key, kind="stable")
    ks = key[order]
    starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    ends = np.r_[starts[1:], len(ks)]
    color = np.full(len(r2), -1, np.int64)
    fails = 0
    for s, e in zip(starts, ends):
        eids = order[s:e]
        try:
            c = pm.color_bipartite(r2[eids], vrow[eids], q=8)
            color[eids] = c
        except ValueError:
            fails += 1
    return color, fails


def check(L, block, color):
    lane = 8 * block + color
    # proper per exchange row: (tile, r2, lane) unique
    k1 = (L["td"] * Q + L["r2"]) * Q + lane
    assert len(np.unique(k1)) == len(k1), "src-row collision"
    # one row per (tile, vrow, block)
    key = (L["td"] * Q + L["vrow"]) * 16 + block
    import collections

    owner = {}
    for i in range(len(key)):
        o = owner.setdefault(int(key[i]), int(L["mrow"][i]))
        assert o == int(L["mrow"][i]), "block shared by two rows"
    # distinct lane per (vrow, tile) within a row — implied by k2:
    k2 = (L["td"] * Q + L["vrow"]) * Q + lane
    assert len(np.unique(k2)) == len(k2), "dst collision"
    log("constraint checks passed")


def run(name, csr):
    log(f"=== {name}: {csr.shape} nnz={csr.nnz}")
    L = layout_elements(csr)
    log(f"T={L['T']} rp128={L['rp128']}")
    block, overload = assign_blocks(L)
    if overload:
        log(f"INFEASIBLE before coloring: {overload} overflowed entries")
        return
    color, fails = color_blocks(L, block)
    if fails:
        log(f"INFEASIBLE: {fails} (tile, block) colorings failed")
        return
    check(L, block, color)
    log(f"{name}: v3 routing FEASIBLE")


def main():
    rng = np.random.default_rng(0)
    n, nnz_target = 100_000, 700_000
    rows = rng.integers(0, n, nnz_target)
    cols = rng.integers(0, n, nnz_target)
    m = sp.csr_matrix((rng.random(nnz_target), (rows, cols)), shape=(n, n))
    run("uniform-700k", m)

    # power-law-ish column distribution, capped row width (no hub split)
    nr = 200_000
    counts = np.minimum(rng.zipf(2.1, nr), 80)
    rows = np.repeat(np.arange(nr), counts)
    cols = rng.integers(0, nr, len(rows))
    m2 = sp.csr_matrix((rng.random(len(rows)), (rows, cols)),
                       shape=(nr, nr))
    run("powerlaw-capped", m2)


if __name__ == "__main__":
    main()
