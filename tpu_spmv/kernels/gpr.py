"""GPR ("gather–permute–reduce") — fast general-pattern CSR SpMV.

The packed-ELL kernel (``ell_pallas``) wins only when consecutive rows
share column segments; scattered patterns blow up its gather-round count.
This pipeline removes that constraint by splitting the three concerns and
giving each the layout it wants:

1. **Gather** ``x`` in *segment-grouped* order: every 128-lane sublane
   reads from ONE x2d row (one dynamic slice + one lane-gather per 8
   sublanes) at ~91%+ slot utilization regardless of row structure.
2. **Permute** the gathered values into *row-aligned* PSELL slots with the
   general permutation engine (``permute.apply_permutation`` — measured
   6.8 Gval/s, 52x XLA's gather).  The matrix VALUES never move at
   runtime: they are pre-permuted on the host at pack time.
3. **Reduce** with the PSELL mask-dot (per-tile ``[8,128] @ [128,k]``
   MXU contraction).

Rows are σ-grouped into **width classes** (lane budgets 8/16/32/64/128,
rows per sublane 16/8/4/2/1): each class packs at its own density, so wide
rows never force spills and narrow rows never waste lanes.  The reduce
emits y in class-sorted row order; a second (tiny, nrow-sized) pass
through the permutation engine restores natural order.  Only entries
beyond 128 per row fall back to a COO side path.

Envelope: ``ncol <= 3M`` (x2d VMEM-resident) and ``nnz <= ~2.4M`` per
pipeline (the permutation engine's exchange stage is VMEM-resident;
routing goes two-level automatically past ~1M elements);
:func:`pack_gpr_chunked` lifts the nnz cap further by splitting rows into
blocks with independent plans (outputs concatenate).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.base import sparse_dataclass, static_field
from ..formats.coo import COO
from . import permute as _perm

__all__ = ["GPCSR", "pack_gpr", "spmv_gpr", "spmm_gpr", "GPCSRChunked",
           "pack_gpr_chunked", "spmv_gpr_chunked", "spmm_gpr_chunked",
           "supports"]

LANES = 128
#: width-class lane budgets (rows per sublane = 128 // W)
CLASS_W = (8, 16, 32, 64, 128)


def _host_coo_sorted(rows, cols, data, shape, dtype) -> COO:
    """Row-major-sorted COO with NUMPY leaves (the pack's final batched
    ``jax.device_put`` uploads it with everything else — see pack_gpr).
    Mirrors ``COO.from_arrays`` semantics without the per-leaf device
    transfers."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    data = np.asarray(data)
    if rows.size:
        order = np.lexsort((cols, rows))
        rows, cols, data = rows[order], cols[order], data[order]
    return COO(row=rows.astype(np.int32), col=cols.astype(np.int32),
               data=data.astype(np.dtype(dtype)),
               shape=(int(shape[0]), int(shape[1])), rows_sorted=True)


def _acc_dtype(dtype) -> jnp.dtype:
    """Matmul accumulator dtype: f32 for <=32-bit data (Mosaic's
    requirement for bf16, lossless for f32), the data dtype itself for
    f64 packs so the interpret/CPU-oracle path keeps full precision."""
    return jnp.float32 if jnp.dtype(dtype).itemsize <= 4 else jnp.dtype(dtype)
#: cap per single pipeline: the permutation engine's exchange stage keeps
#: the whole routed buffer VMEM-resident (~n*4 bytes <= ~12 MB), so one
#: plan covers n ~ 3M slots ~ 2.4M nnz.  Routing itself goes two-level
#: (plan_permutation_auto) past ~1M; beyond MAX_NNZ use pack_gpr_chunked.
MAX_NNZ = 2_400_000
#: tiles per grid step — 4KB per-tile blocks are DMA-overhead-bound
TPS = 16
#: default row-chunk size for pack_gpr_chunked / the planner.  Well below
#: the ~900k single-level routing cap — but the operative bound is TILE
#: FILL, not routability: the exchange-stage row budget eases roughly
#: quadratically as chunks shrink (rows/tile ~ nnz/(T*qcap) for T tiles),
#: so smaller chunks land FULLER tiles and every per-tile stage cost
#: (T-G-T-G shuffles, exchange reads, mask-dots) drops with the tile
#: count.  Measured on chip (round 4): 700k-nnz uniform packs at
#: rp128=80/T=100 as ONE plan vs rp128=104/T=79 as two 350k chunks
#: (SpMV 124 -> 105 us, SpMM32 3.65 -> 2.86 ms); 5M-nnz power-law
#: 1154 us at 700k chunks -> 827 us at 350k (rp128 64 -> 96).  Below
#: ~250k the per-chunk fixed costs win (125k chunks: 124 us).
CHUNK_NNZ = 350_000
#: attempt engine-v3 (color-as-final-lane) routing on default packs —
#: drops stage-3's final transpose + b3 gather; transparently falls back
#: to the v2 planes when the router finds no feasible coloring
ENGINE_V3 = True


@sparse_dataclass
class GPCSR:
    """Packed operands for the gather–permute–reduce SpMV.

    Leaves:
      gseg: ``[NS] int32`` x2d row per gather sublane.
      glidx: ``[NS, 128] int32`` lane index (col % 128) per gather slot.
        On ``fused`` packs the plan's first gather plane (``a1``) is
        composed in at pack time — the x-gather then lands values
        directly in post-stage-1-gather order (one fewer VPU gather and
        one fewer int8 plane per pass).
      plan: permutation moving gathered values into class-major PSELL
        slots (``a1`` is a 1-element dummy on fused packs).
      vals: pre-permuted values.  Fused packs store the PLAN-TILE layout
        ``[T, rp128, 128]`` (plan tile t, sublane row, lane; zero rows
        beyond the class capacity) so the stage-3 kernel can multiply
        and mask-dot in place; non-fused packs keep the class-tile
        layout ``[Ttot, 8, 128]`` for the standalone reduce.
      yplan: permutation restoring class-sorted y to natural row order
        (None when a single class keeps rows in order).
      side: COO carrying only per-row tails beyond 128 entries.
    Static: shape, nnz, and per-class layout
      ``class_tiles = ((W, T, rows), ...)`` for nonempty classes in order.
    """

    gseg: jax.Array
    glidx: jax.Array
    plan: _perm.PermutationPlan
    vals: jax.Array
    yplan: object                  # PermutationPlan | None
    side: COO
    side_gpr: object               # GPCSR | None — >128-per-row tails
    shape: tuple[int, int] = static_field()
    nnz: int = static_field()
    class_tiles: tuple = static_field()
    #: [nv] int32 owning logical row per virtual (hub-split) row, or None
    hub_owner: object = None
    #: per-column-block gather operands for ncol > ~3M (x2d cannot stay
    #: VMEM-resident whole): tuple of (gseg_b, glidx_b) pairs with
    #: SEGMENT-RELATIVE row ids; () when single-block.
    gblocks: tuple = ()
    #: static ((sub_lo, sub_hi, seg_lo, seg_hi), ...) per column block
    col_blocks: tuple = static_field(default=())
    #: single-launch fused pipeline: gather+stage-1 fused (a1 folded into
    #: glidx) and stage-2/3 fused with the mask-dot reduce (vals in plan
    #: layout).  Set at pack time iff single-block + single-level plan.
    fused: bool = static_field(default=False)
    #: engine v3 (color-as-final-lane routing): stage 3 is exchange ->
    #: multiply (vals in EXCHANGE layout [T, 128, 128]) -> transpose ->
    #: b2 gather -> transposed mask-dot; the final transpose and the b3
    #: gather disappear (~330 ns/tile measured, tools/probe_engine_v3.py).
    #: Set when the v3 router found a feasible coloring (falls back to
    #: the v2 planes otherwise).
    fused_v3: bool = static_field(default=False)
    #: number of virtual hub-split rows appended after shape[0] real rows
    nv: int = static_field(default=0)

    @property
    def ntiles(self) -> int:
        return int(self.vals.shape[0])

    @property
    def nsub(self) -> int:
        return int(self.glidx.shape[0])

    @property
    def dtype(self):
        return self.vals.dtype


#: segments (128-column groups) per gather column block: ~11 MB of x2d
#: VMEM residency per block; ncol beyond one block goes through the
#: blocked gather (one pallas call per block, outputs concatenate)
CB_SEGS = 22_000


def supports(shape, nnz, *, chunked: bool = True) -> bool:
    """GPR envelope.  The ncol bound is the blocked gather's reach (block
    count capped at ~10; per-block launch cost ~20-30us each).  With
    ``chunked`` (the planner's path) nnz is unlimited — row chunks of
    ``CHUNK_NNZ`` each carry their own plan; ``chunked=False`` gives the
    single-pack (``pack_gpr``) cap."""
    if shape[1] > CB_SEGS * LANES * 10:
        return False
    return True if chunked else nnz <= MAX_NNZ


def pack_gpr(mat, *, dtype=np.float32, _depth: int = 0,
             targets: dict | None = None,
             padded_y: bool = False,
             single_level_only: bool = False,
             host_out: dict | None = None,
             defer_s1: bool = False,
             force_rp: int | None = None,
             device: bool = True) -> GPCSR:
    """Pack a scipy matrix (or host COO) for the GPR pipeline.

    ``targets`` forces the pack's static layout to given sizes so that
    MULTIPLE packs share one pytree structure (the SPMD requirement for
    running GPR as a shard-local kernel — every shard must compile the
    same program).  Keys: ``ns8`` (gather sublanes), ``class_T`` (tiles
    per width class, len(CLASS_W)), ``side_nnz`` (COO tail entries, padded
    with zero-valued (0,0) entries), ``rp`` (permutation tile fill,
    forced).  Each must be >= the natural size; tails never recurse
    (side_gpr stays None) under targets.  (Y-permutation uniformity
    comes from ``class_T`` + ``rp`` with ``padded_y`` — there is no
    separate length target.)

    ``padded_y`` keeps the class-capacity padding in the reduce output
    (class_tiles rows entries become capacities) and folds the compaction
    into the y permutation instead — the per-shard *values* of that plan
    differ, its shape does not.

    ``host_out``, when a dict, is filled with the HOST-side pieces the
    chunk-fold of :func:`pack_gpr_chunked` needs (stage-1 operand numpy
    arrays, the y-reorder source positions, hub owners) — so the fold is
    assembled without ever reading device leaves back through the tunnel.

    ``defer_s1`` (chunk-fold internal): on a fused pack, do NOT upload
    the stage-1 operands (gseg/glidx/a2/a3) — leave zero-size stubs on
    the GPCSR and carry the planes only in ``host_out["s1"]``.  The
    caller either concatenates them into a :class:`ChunkFold` (whose
    folded pipelines are then the only stage-1 consumers — the per-chunk
    copies would double the stage-1 HBM/disk footprint, ADVICE r2) or
    rehydrates the chunk via :func:`_rehydrate_s1` when no fold engages.
    """
    if padded_y and host_out is not None:
        # the chunk-fold assembles y-reorders from host_out assuming the
        # NON-padded class-sorted layout (y_pos/nrow_internal semantics);
        # a padded_y pack's reduce output is cap_total long in perm_y
        # order and would silently mis-compose — refuse the combination
        raise ValueError("padded_y packs cannot fill host_out (chunk-fold "
                         "y-reorder assumes the compacted layout)")
    if hasattr(mat, "tocsr"):
        csr = mat.tocsr()
        csr.sort_indices()
        indptr = np.asarray(csr.indptr, dtype=np.int64)
        cols = np.asarray(csr.indices, dtype=np.int64)
        data = np.asarray(csr.data).astype(dtype)
        nrow, ncol = csr.shape
    else:
        coo = mat
        order = np.lexsort((np.asarray(coo.col), np.asarray(coo.row)))
        rows_np = np.asarray(coo.row, dtype=np.int64)[order]
        cols = np.asarray(coo.col, dtype=np.int64)[order]
        data = np.asarray(coo.data).astype(dtype)[order]
        nrow, ncol = coo.shape
        counts0 = np.bincount(rows_np, minlength=nrow)
        indptr = np.zeros(nrow + 1, dtype=np.int64)
        np.cumsum(counts0, out=indptr[1:])
    nnz = len(cols)
    nrow_logical = nrow
    # ---- hub-row splitting (round 2): rows beyond 128 entries become
    # VIRTUAL rows of <= 128 entries appended after the real row space; a
    # tiny sorted segment-sum folds them back after the reduce.  The
    # whole matrix then flows through the fused pipeline — the COO side
    # path (0.13 Gval/s) and nested side packs disappear (power-law
    # 200k/1.5M-nnz measured 2.1 ms -> main-pipeline speed).  Under
    # ``targets`` the old side-COO path is kept (virtual-row counts are
    # data-dependent and could not be shape-forced cheaply).
    hub_owner = np.zeros(0, dtype=np.int32)
    counts = np.diff(indptr)
    # (skip splitting when the FULL nnz exceeds the routing cap — e.g. a
    # single >MAX_NNZ hub row packed directly: only its first 128 entries
    # route and the tail keeps the legacy side path; pack_gpr_chunked
    # keeps chunks under the cap, so chunked packs always split)
    if (targets is None and counts.max(initial=0) > LANES
            and nnz <= MAX_NNZ):
        row_ids0 = np.repeat(np.arange(nrow, dtype=np.int64), counts)
        offs0 = np.arange(nnz, dtype=np.int64) - indptr[row_ids0]
        blk = offs0 >> 7                       # 128-entry block within row
        hub = blk > 0
        maxb = int(blk.max()) + 1
        uniq, inv = np.unique(row_ids0[hub] * maxb + blk[hub],
                              return_inverse=True)
        new_rows = row_ids0.copy()
        new_rows[hub] = nrow + inv
        hub_owner = (uniq // maxb).astype(np.int32)
        nrow = nrow + len(uniq)
        order = np.lexsort((cols, new_rows))
        cols = cols[order]
        data = data[order]
        counts = np.bincount(new_rows, minlength=nrow)
        indptr = np.zeros(nrow + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
    # the routing cap applies to the MAIN (<=128-per-row) part — tails
    # beyond 128/row spill to side_gpr/COO below, so a few huge hub rows
    # don't disqualify the whole pack (ADVICE r1: single-row chunks from
    # pack_gpr_chunked must not fail here)
    main_nnz = int(np.minimum(counts, LANES).sum())
    if main_nnz > MAX_NNZ:
        raise ValueError(
            f"main nnz={main_nnz} > {MAX_NNZ}: chunk by row blocks"
        )
    row_ids = np.repeat(np.arange(nrow, dtype=np.int64), counts)

    # ---- width classes ----------------------------------------------------
    cls = np.minimum(np.searchsorted(CLASS_W, counts), len(CLASS_W) - 1)
    row_order = np.argsort(cls, kind="stable")       # class-major row order
    sorted_pos = np.empty(nrow, dtype=np.int64)
    sorted_pos[row_order] = np.arange(nrow)
    cls_sorted = cls[row_order]
    rows_per_class = np.bincount(cls, minlength=len(CLASS_W))
    cstart = np.zeros(len(CLASS_W) + 1, dtype=np.int64)
    np.cumsum(rows_per_class, out=cstart[1:])

    # entries beyond 128 per row spill: recurse (each level strips another
    # 128 per row; σ-class compaction keeps sparse tails routable) or fall
    # to the COO path when tiny
    offs = np.arange(nnz, dtype=np.int64) - indptr[row_ids]
    main = offs < LANES
    t_rows, t_cols, t_data = row_ids[~main], cols[~main], data[~main]
    side_gpr = None
    # measured crossover: below ~60k tail entries the COO path's
    # ~8ns/entry beats a nested pipeline's fixed ~0.4ms overhead.
    # Under targets tails never recurse (the nested pack's shapes could
    # not be forced uniform across shards).
    if len(t_rows) > 60_000 and _depth < 4 and targets is None:
        import scipy.sparse as sp

        try:
            side_gpr = pack_gpr(
                sp.csr_matrix((t_data, (t_rows, t_cols)),
                              shape=(nrow, ncol)),
                dtype=dtype, _depth=_depth + 1, device=False,
            )
            t_rows = t_cols = np.zeros(0, dtype=np.int64)
            t_data = np.zeros(0, dtype=dtype)
        except ValueError:
            side_gpr = None
    if targets is not None:
        pad = targets["side_nnz"] - len(t_rows)
        if pad < 0:
            raise ValueError(
                f"side_nnz target {targets['side_nnz']} < natural "
                f"{len(t_rows)}")
        t_rows = np.pad(t_rows, (0, pad))
        t_cols = np.pad(t_cols, (0, pad))
        t_data = np.pad(t_data, (0, pad))     # zero values: inert
    side = _host_coo_sorted(t_rows, t_cols, t_data, (nrow, ncol), dtype)
    m_rows, m_cols, m_data, m_off = (row_ids[main], cols[main], data[main],
                                     offs[main])
    nm = len(m_rows)

    # ---- per-class PSELL destination layout ------------------------------
    class_tiles = []
    tile_base = np.zeros(len(CLASS_W), dtype=np.int64)
    Ttot = 0
    for c, W in enumerate(CLASS_W):
        rows_c = int(rows_per_class[c])
        k_c = LANES // W
        T_c = -(-rows_c // (8 * k_c)) if rows_c else 0
        if targets is not None:
            if targets["class_T"][c] < T_c:
                raise ValueError(
                    f"class_T target {targets['class_T'][c]} < natural "
                    f"{T_c} for class {c}")
            T_c = targets["class_T"][c]
        if T_c == 0:
            class_tiles.append((W, 0, 0))
            continue
        tile_base[c] = Ttot
        # padded_y: the reduce emits the full class capacity; compaction
        # happens in the y permutation instead (shape-uniform packs)
        class_tiles.append((W, T_c, T_c * 8 * k_c if padded_y else rows_c))
        Ttot += T_c
    Ttot = max(Ttot, 1)

    e_cls = cls[m_rows]
    W_e = np.asarray(CLASS_W)[e_cls]
    k_e = LANES // W_e
    lr = sorted_pos[m_rows] - cstart[e_cls]          # local row within class
    d_lane = (lr % k_e) * W_e + m_off
    d_sub = (lr // k_e) % 8
    d_tile = tile_base[e_cls] + lr // (8 * k_e)
    dst_flat = (d_tile * 8 + d_sub) * LANES + d_lane

    vals_ps = np.zeros((Ttot, 8, LANES), dtype=data.dtype)
    vals_ps[d_tile, d_sub, d_lane] = m_data

    # ---- gather-side layout: segment-grouped slots -----------------------
    seg_order = np.argsort(m_cols >> 7, kind="stable")
    seg_sorted = (m_cols >> 7)[seg_order]
    new_seg = np.ones(nm, dtype=bool)
    new_seg[1:] = seg_sorted[1:] != seg_sorted[:-1]
    run_start = np.maximum.accumulate(np.where(new_seg, np.arange(nm), 0))
    pos_in_seg = np.arange(nm) - run_start
    glane = pos_in_seg % LANES
    new_sub = new_seg | (pos_in_seg % LANES == 0)
    gsub = np.cumsum(new_sub) - 1
    NS = int(gsub[-1]) + 1 if nm else 1
    NS8 = -(-NS // 8) * 8
    if targets is not None:
        if targets["ns8"] < NS8:
            raise ValueError(f"ns8 target {targets['ns8']} < natural {NS8}")
        NS8 = targets["ns8"]
    gseg = np.zeros(NS8, dtype=np.int32)
    glidx = np.zeros((NS8, LANES), dtype=np.int8)   # lane ids < 128
    if nm:
        gseg[gsub[new_sub]] = seg_sorted[new_sub]
        glidx[gsub, glane] = (m_cols & 127)[seg_order]

    # ---- permutation: gather slots -> class-major PSELL slots ------------
    N = max(NS8 * LANES, Ttot * 8 * LANES)
    src_flat = gsub * LANES + glane
    perm = np.full(N, -1, dtype=np.int64)
    if nm:
        perm[dst_flat[seg_order]] = src_flat
    # slack slots stay -1 (don't-care): the router skips them entirely —
    # a completed dummy mapping adds real cross-tile flows that blow the
    # per-tile row budget at scale
    hp: dict = {}
    # engine v3 metadata: per flat destination position, the element's
    # class width, its (internal) matrix row, and the usable j-slot count
    # of its vals row (tail vals rows are partially occupied; swaps must
    # stay inside the used region so the per-class [:rows] extraction
    # stays a static slice)
    v3_meta = None
    if (ENGINE_V3 and targets is None and nm
            and -(-ncol // LANES) <= CB_SEGS):
        jcap_e = np.minimum(
            k_e, rows_per_class[e_cls] - (lr // k_e) * k_e)
        w_of_dst = np.zeros(N, np.int32)
        row_of_dst = np.full(N, -1, np.int64)
        jcap_of_dst = np.zeros(N, np.int32)
        w_of_dst[dst_flat] = W_e
        row_of_dst[dst_flat] = m_rows
        jcap_of_dst[dst_flat] = jcap_e
        v3_meta = dict(w_of_dst=w_of_dst, row_of_dst=row_of_dst,
                       jcap_of_dst=jcap_of_dst)
    if targets is not None:
        plan = _perm.plan_permutation(perm, force_r_p=targets["rp"],
                                      host_planes=hp, device=False)
    elif force_rp is not None:
        # pin the stage-1 tile fill (rp128 units) so this pack can join a
        # chunk-fold with siblings (the fold's ONE concatenated stage-1
        # grid needs a single static fill; chunks left to their own r_p
        # search pick different fills — measured 96 vs 104 on power-law —
        # and the fold silently degrades to per-chunk launches).  The v3
        # ladder still runs (with the pinned fill) so hinted siblings keep
        # the faster stage-3.  Raises ValueError when the forced fill
        # cannot route at all; the caller falls back to the natural pack.
        plan = None
        if v3_meta is not None:
            for qc in _perm.V3_QCAP_LADDER:
                try:
                    hp = {}
                    plan = _perm.plan_permutation(
                        perm, host_planes=hp, qcap=qc, v3_meta=v3_meta,
                        v3_strict=True, force_r_p=force_rp * LANES,
                        device=False)
                    break
                except _perm.V3Infeasible:
                    plan = None
                except ValueError:
                    # budget infeasible at the forced fill at this qcap —
                    # keep probing: the ladder's 128 rung has exactly
                    # the v2 row budget, so it can still route where a
                    # smaller qcap inflates rows past the cap
                    plan = None
        if plan is None:
            hp = {}
            plan = _perm.plan_permutation(perm, force_r_p=force_rp * LANES,
                                          host_planes=hp, device=False)
    else:
        plan = None
        if v3_meta is not None:
            # probe the qcap ladder; strict probes raise BEFORE any plane
            # coloring, so a failed rung costs only the stage-2 numpy
            # machinery + the (0.1s-scale) C++ router
            for qc in _perm.V3_QCAP_LADDER:
                try:
                    hp = {}
                    plan = _perm.plan_permutation(
                        perm, host_planes=hp, qcap=qc,
                        v3_meta=v3_meta, v3_strict=True, device=False)
                    break
                except _perm.V3Infeasible:
                    plan = None
                except ValueError:
                    # single-level budget infeasible at this qcap — keep
                    # probing: the 128 rung matches v2's budget exactly
                    plan = None
        if plan is None:
            # single_level_only raises before any coloring when the flows
            # need two-level routing — the adaptive chunker splits instead
            hp = {}
            plan = _perm.plan_permutation_auto(
                perm, host_planes=hp, two_level=not single_level_only,
                device=False)

    # ---- column blocking for ncol beyond one VMEM-resident x2d ----------
    col_blocks: tuple = ()
    gblocks: tuple = ()
    S_total = -(-ncol // LANES)
    if S_total > CB_SEGS and nm:
        bounds = [min(b * CB_SEGS, S_total)
                  for b in range(-(-S_total // CB_SEGS) + 1)]
        # real gather sublanes are segment-ascending; padded tail rows are
        # zeros and excluded from the search
        subs = np.searchsorted(gseg[:NS], bounds, side="left")
        cb, gb = [], []
        for b in range(len(bounds) - 1):
            lo, hi = int(subs[b]), int(subs[b + 1])
            if hi <= lo:
                continue
            nb8 = -(-(hi - lo) // 8) * 8
            gs = np.zeros(nb8, dtype=np.int32)
            gs[: hi - lo] = gseg[lo:hi] - bounds[b]
            gl = np.zeros((nb8, LANES), dtype=np.int8)
            gl[: hi - lo] = glidx[lo:hi]
            cb.append((lo, hi, bounds[b], bounds[b + 1]))
            gb.append((gs, gl))        # numpy: the final batched
            #                              device_put uploads gblocks too
        col_blocks = tuple(cb)
        gblocks = tuple(gb)
    # single-level plans (single-block only): pad the gather layout to
    # whole plan tiles so the gather can run INSIDE the plan's stage-1
    # kernel (one fewer full pass over the payload + one fewer launch).
    # Padded slots gather garbage that only ever reaches dummy destination
    # slots (real destinations are sourced exclusively from real slots).
    fused = bool(not col_blocks and isinstance(plan, _perm.PermutationPlan))
    fused_v3 = bool(fused and hp.get("v3"))
    vals_store = vals_ps
    if fused:
        rp128 = plan.real_per_tile // LANES
        ns_need = plan.ntiles * rp128
        if ns_need > len(gseg):
            gseg = np.pad(gseg, (0, ns_need - len(gseg)))
            glidx = np.pad(glidx, ((0, ns_need - len(glidx)), (0, 0)))
        # fold the plan's first gather plane into the gather lane indices:
        # stage 1's G1 moves values within each sublane row, so the
        # x-gather can read them pre-permuted — glidx'[r, m] =
        # glidx[r, a1[t, r%rp128, m]].  One fewer in-kernel gather
        # (96 ns/tile measured) and 1 int8 plane less traffic per pass.
        a1r = hp["a1"][:, :rp128, :].reshape(plan.ntiles * rp128, LANES)
        glidx = np.take_along_axis(glidx, a1r, axis=1)
        if fused_v3:
            # vals in EXCHANGE layout [T, 128(r2), 128(final lane)]: the
            # v3 kernel multiplies right after the stack8 exchange, then
            # transposes once, b2-gathers, and mask-dots the transposed
            # product — non-element slots are exact zeros, which is what
            # makes the b2 fill slots inert
            ve = hp["v3_elem"]
            val_of_dst = np.zeros(N, dtype=vals_ps.dtype)
            val_of_dst[dst_flat] = m_data
            vals_store = np.zeros((plan.ntiles, LANES, LANES),
                                  vals_ps.dtype)
            vals_store[ve["td"], ve["r2"], ve["lane"]] = \
                val_of_dst[ve["dst_pos"]]
        else:
            # vals in PLAN-TILE layout for the fused stage-3 + mask-dot
            # reduce: flat dest element i of the routed space lives at
            # plan tile i // r_p, row (i % r_p) // 128, lane i % 128
            nv2 = plan.ntiles * plan.real_per_tile
            vflat = np.zeros(nv2, dtype=vals_ps.dtype)
            vflat[: vals_ps.size] = vals_ps.reshape(-1)
            vals_store = vflat.reshape(plan.ntiles, rp128, LANES)
        if host_out is not None:
            # the stage-1 operands, host-side, tile-aligned — what the
            # chunk-fold concatenates (values in gseg/glidx index the
            # GLOBAL x2d, so concatenation needs no rebasing)
            ns_need = plan.ntiles * rp128
            host_out["s1"] = dict(
                gseg=np.asarray(gseg[:ns_need]),
                glidx=np.asarray(glidx[:ns_need]),
                a2=np.asarray(hp["a2"], dtype=np.int8),
                a3=np.asarray(hp["a3"], dtype=np.int8),
                rp128=int(rp128), T=int(plan.ntiles))
        # device_put of numpy zeros, NOT eager jnp.zeros: the latter
        # compiles a broadcast_in_dim per shape (~0.45 s each through
        # the remote-compile tunnel — measured pack cold-start, round 5)
        plan = dataclasses.replace(plan, a1=np.zeros((1, 1, 1), np.int8))
        if defer_s1 and host_out is not None:
            # stage-1 planes live only in host_out["s1"] for now; the
            # a2 stub keeps its tile axis so plan.ntiles stays correct
            gseg = np.zeros(0, dtype=np.int32)
            glidx = np.zeros((0, LANES), dtype=np.int8)
            plan = dataclasses.replace(
                plan,
                a2=np.zeros((plan.ntiles, 1, 1), np.int8),
                a3=np.zeros((1, 1, 1), np.int8))

    # ---- y reordering (class-sorted -> natural) --------------------------
    yplan = None
    if fused_v3:
        # v3 reassigns each row's j-slot within its vals row (its partial
        # window follows its elements' final lanes: j = lane // W); rows
        # with no elements take the leftover j's of their vals row, so
        # the used region of every class stays the leading static slice
        ve = hp["v3_elem"]
        j_dst = np.full(N, -1, np.int64)
        j_dst[ve["dst_pos"]] = (ve["lane"]
                                // w_of_dst[ve["dst_pos"]])
        rows_j = np.full(nrow, -1, np.int64)
        rows_j[m_rows] = j_dst[dst_flat]
        k_all = LANES // np.asarray(CLASS_W)[cls]
        vrl = (sorted_pos - cstart[cls]) // k_all
        gkey = cls * nrow + vrl          # unique per (class, vals row)
        ug, ginv = np.unique(gkey, return_inverse=True)
        gsize = np.bincount(ginv)
        taken = np.zeros((len(ug), 16), bool)
        has = rows_j >= 0
        taken[ginv[has], rows_j[has]] = True
        # slots beyond the group's row count are unusable (tail vals row)
        taken[np.arange(16)[None, :] >= gsize[:, None]] = True
        _, free_j = np.nonzero(~taken)            # sorted by (g, j)
        miss = np.flatnonzero(~has)
        miss = miss[np.argsort(ginv[miss], kind="stable")]
        rows_j[miss] = free_j                      # counts match per group
        new_pos = cstart[cls] + vrl * k_all + rows_j
        yplan = _perm.plan_permutation_auto(new_pos, device=False)
        if host_out is not None:
            host_out["y_pos"] = new_pos
    elif padded_y:
        # padded class-capacity space -> natural rows: the compaction the
        # non-padded path does with static slicing lives HERE, in the plan
        # VALUES, so packs with different class occupancies share shapes
        caps = np.array([T_c * 8 * (LANES // W)
                         for W, T_c, _ in class_tiles], dtype=np.int64)
        pbase = np.zeros(len(caps) + 1, dtype=np.int64)
        np.cumsum(caps, out=pbase[1:])
        cap_total = max(int(pbase[-1]), 1)
        perm_y = np.full(cap_total, -1, dtype=np.int64)
        padded_pos = pbase[cls] + (sorted_pos - cstart[cls])
        perm_y[:nrow] = padded_pos            # outputs past nrow: don't-care
        yplan = (_perm.plan_permutation(perm_y, force_r_p=targets["rp"],
                                        device=False)
                 if targets is not None
                 else _perm.plan_permutation_auto(perm_y, device=False))
    elif not np.array_equal(row_order, np.arange(nrow)):
        yplan = _perm.plan_permutation_auto(sorted_pos, device=False)
        if host_out is not None:
            host_out["y_pos"] = sorted_pos
    if host_out is not None:
        host_out.setdefault("y_pos", None)      # identity reorder
        host_out["hub_owner"] = hub_owner
        host_out["nrow_internal"] = int(nrow)
        host_out["nrow_logical"] = int(nrow_logical)

    out = GPCSR(
        gseg=np.asarray(gseg, dtype=np.int32),
        glidx=np.asarray(glidx),
        plan=plan,
        vals=np.asarray(vals_store),
        yplan=yplan,
        side=side,
        side_gpr=side_gpr,
        gblocks=gblocks,
        shape=(int(nrow_logical), int(ncol)),
        nnz=int(nnz),
        class_tiles=tuple(class_tiles),
        col_blocks=col_blocks,
        fused=fused,
        fused_v3=fused_v3,
        hub_owner=(np.asarray(hub_owner, dtype=np.int32)
                   if len(hub_owner) else None),
        nv=int(len(hub_owner)),
    )
    # ONE batched device_put for the whole pack pytree (plan planes,
    # vals, gather operands, side COO, nested side_gpr): per-array
    # transfers pay a per-call tunnel round-trip each — measured as half
    # the pack cold-start (round 5).  device=False defers entirely
    # (pack_gpr_chunked uploads all chunks + fold in one call).
    return jax.device_put(out) if device else out


def _gather_kernel(gseg_ref, glidx_ref, x_ref, o_ref, *, tps):
    step = pl.program_id(0)

    def body(tb, _):
        base = (step * tps + tb) * 8
        tile = jnp.stack([x_ref[gseg_ref[base + i], :] for i in range(8)])
        o_ref[tb] = jnp.take_along_axis(
            tile, glidx_ref[tb].astype(jnp.int32), axis=1)
        return 0

    lax.fori_loop(0, tps, body, 0)


def _fused_gather_s1_kernel(gseg_ref, glidx_ref, x_ref, a2_ref,
                            a3_ref, o_ref, *, rp128):
    """Gather + permutation stage 1 in one pass: build the plan tile's
    payload directly from x2d (8 row slices + one lane-gather per sublane
    group) and apply the within-tile T-G-T-G immediately — the gathered
    intermediate never round-trips HBM, and the plan's first gather plane
    (a1) is already composed into ``glidx`` at pack time."""
    t = pl.program_id(0)
    groups = []
    for g in range(rp128 // 8):
        base = t * rp128 + g * 8
        tile = jnp.stack([x_ref[gseg_ref[base + i], :] for i in range(8)])
        idx = glidx_ref[g * 8:(g + 1) * 8].astype(jnp.int32)
        groups.append(jnp.take_along_axis(tile, idx, axis=1))
    z = jnp.concatenate(groups, axis=0)
    if rp128 < LANES:
        z = jnp.pad(z, ((0, LANES - rp128), (0, 0)))
    o_ref[0] = _perm._tgtg(z, a2_ref[0], a3_ref[0])


def _stage1_call(gseg, glidx, x2d, a2, a3, *, rp128: int, dtype,
                 interpret: bool = False) -> jax.Array:
    """One fused gather+stage-1 launch over ``a2.shape[0]`` tiles.  The
    operands may belong to ONE pack or be the tile-axis concatenation of
    several packs sharing ``rp128`` (the chunk-fold): gseg/glidx index
    the global x2d, so tile t of the combined grid is exactly tile t of
    its owning pack."""
    T = int(a2.shape[0])
    return pl.pallas_call(
        functools.partial(_fused_gather_s1_kernel, rp128=rp128),
        out_shape=jax.ShapeDtypeStruct((T, LANES, LANES), dtype),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # gseg
            pl.BlockSpec((rp128, LANES), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),       # glidx
            pl.BlockSpec(memory_space=pltpu.VMEM),       # x2d
            pl.BlockSpec((1, LANES, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, LANES, LANES), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(gseg, glidx, x2d, a2, a3)


def _run_stage1_fused(A: GPCSR, x2d: jax.Array, *,
                      interpret: bool = False) -> jax.Array:
    """The fused gather + permutation-stage-1 launch: ``x2d [S, 128]`` →
    ``z [T, 128, 128]`` (also used standalone by the stage profiler)."""
    plan = A.plan
    return _stage1_call(A.gseg, A.glidx, x2d, plan.a2, plan.a3,
                        rp128=plan.real_per_tile // LANES,
                        dtype=A.vals.dtype, interpret=interpret)


def _mask16(dtype):
    """``[128, 16]`` width-8 partial-sum mask: lane l contributes to
    partial l // 8.  All width classes are multiples of 8, so every
    class's row sums assemble from these partials (``_combine_partials``)."""
    lane = np.arange(LANES)
    return jnp.asarray(lane[:, None] // 8 == np.arange(16)[None, :],
                       dtype=dtype)


def _run_s23_reduce_fused(A: GPCSR, z: jax.Array, *,
                          interpret: bool = False) -> jax.Array:
    """``z [T, 128, 128]`` (stage-1 output) → width-8 partials
    ``[T, rp128, 16]`` in plan-tile row order.  Runs the batched kernel
    at nrhs=1 — the tile-group batching (``TB_S23`` tiles per grid step,
    one fat ``[tb*rp128, 128] @ [128, 16]`` MXU pass each) amortizes the
    per-step fixed cost the same way either way."""
    T = A.plan.ntiles
    return _run_s23_reduce_fused_batched(
        A, z.reshape(1, T * LANES, LANES), interpret=interpret)[0]


def _combine_partials(P2: jax.Array, class_tiles) -> list:
    """Second-level class sums over width-8 partials.

    ``P2 [..., T*rp128, 16]`` is vals-row-major (plan row r of tile t =
    vals row ``t*rp128 + r``; classes occupy contiguous vals-row ranges).
    A class-W row's value is the sum of its W/8 adjacent partials.
    Returns the per-class y blocks (class-sorted row order), as XLA ops
    on the ~16-wide array — a few hundred KB, negligible next to the
    fused kernel's traffic."""
    lead = P2.shape[:-2]
    parts = []
    tb = 0
    for W, T_c, rows_c in class_tiles:
        if T_c == 0:
            continue
        k_c = LANES // W
        blk = lax.slice_in_dim(P2, 8 * tb, 8 * (tb + T_c), axis=P2.ndim - 2)
        y = blk.reshape(lead + (T_c * 8, k_c, W // 8)).sum(axis=-1)
        parts.append(y.reshape(lead + (-1,))[..., :rows_c])
        tb += T_c
    return parts


#: tiles per reduce grid step — one [tps*8, 128] @ [128, k] MXU pass each
REDUCE_TPS = 64


def _reduce_step_kernel(vals_ref, g_ref, mask_ref, o_ref, *, tps, k):
    """Whole-step mask-dot: the step's tiles collapse into ONE
    ``[tps*8, 128] @ [128, k]`` MXU contraction (per-tile fori_loop
    bodies with dynamic first-axis slices cost ~150ns/tile in Mosaic)."""
    prod = (vals_ref[:] * g_ref[:]).reshape(tps * 8, LANES)
    # Accumulator: >=32-bit.  Mosaic requires a 32-bit matmul acc for
    # narrow data (bf16 packs would fail to lower, and bf16 partial
    # sums would lose precision anyway); f64 packs (interpret/CPU
    # oracle paths) must NOT be downgraded to f32 (ADVICE r4).
    out = lax.dot_general(
        prod, mask_ref[:], (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=_acc_dtype(prod.dtype),
    ).astype(prod.dtype)
    o_ref[:] = out.reshape(tps, 8, k)


def _reduce_all_classes(vals, g3, class_tiles, interpret):
    """Per-class reduce launches (classes are contiguous tile ranges, so
    each launch has a STATIC lane budget k and mask)."""
    parts = []
    off = 0
    for W, T_c, rows_c in class_tiles:
        if T_c == 0:
            continue
        k_c = LANES // W
        lane_ids = np.arange(LANES) // W
        mask = jnp.asarray(
            lane_ids[:, None] == np.arange(k_c)[None, :], dtype=vals.dtype)
        v_c, g_c = vals[off: off + T_c], g3[off: off + T_c]
        tps = min(REDUCE_TPS, T_c)
        steps = -(-T_c // tps)
        Tpad = steps * tps
        if Tpad != T_c:
            v_c = jnp.pad(v_c, ((0, Tpad - T_c), (0, 0), (0, 0)))
            g_c = jnp.pad(g_c, ((0, Tpad - T_c), (0, 0), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_reduce_step_kernel, tps=tps, k=k_c),
            out_shape=jax.ShapeDtypeStruct((Tpad, 8, k_c), vals.dtype),
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((tps, 8, LANES), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tps, 8, LANES), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tps, 8, k_c), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(v_c, g_c, mask)
        parts.append(out[:T_c].reshape(-1)[:rows_c])
        off += T_c
    return parts


def _check_s1_present(A: GPCSR, op: str) -> None:
    """Trace-time guard: a chunk whose stage-1 planes were deferred into
    its parent :class:`GPCSRChunked`'s fold cannot run standalone."""
    if A.fused and A.plan.ntiles > 0 and int(A.gseg.shape[0]) == 0:
        raise ValueError(
            f"{op}: this GPCSR's stage-1 planes live in its parent "
            "GPCSRChunked's ChunkFold (defer_s1 pack); call the chunked "
            "entry points (spmv_gpr_chunked / spmm_gpr_chunked) instead")


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmv_gpr(A: GPCSR, x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """``A @ x`` via gather -> permute -> per-class reduce -> y reorder
    (plus the virtual-row fold for hub-split packs)."""
    _check_s1_present(A, "spmv_gpr")
    nrow_l, ncol = A.shape
    nrow = nrow_l + A.nv           # internal row space incl. virtual rows
    S = -(-ncol // LANES)
    xpad = jnp.pad(x, (0, S * LANES - ncol)) if S * LANES != ncol else x
    x2d = xpad.reshape(S, LANES).astype(A.vals.dtype)
    NS8 = A.nsub

    plan = A.plan
    if A.fused:
        # two fused launches end-to-end: (gather + stage 1) then
        # (exchange + stage 3 + mask-dot reduce); only z [T, 128, 128]
        # and the [T, rp128, 16] partials round-trip HBM
        z = _run_stage1_fused(A, x2d, interpret=interpret)
        P = _run_s23_reduce_fused(A, z, interpret=interpret)
        rp128 = plan.real_per_tile // LANES
        parts = _combine_partials(
            P.reshape(plan.ntiles * rp128, 16), A.class_tiles)
    else:
        def run_gather(gseg_in, glidx_in, x2d_in):
            """One gather pallas call over a sublane range (the whole
            layout, or one column block with its x2d slice)."""
            NTg = glidx_in.shape[0] // 8
            g_tps = min(TPS, NTg)
            g_steps = -(-NTg // g_tps)
            NTpad = g_steps * g_tps
            gl3 = glidx_in.reshape(NTg, 8, LANES)
            gs = gseg_in
            if NTpad != NTg:
                gl3 = jnp.pad(gl3, ((0, NTpad - NTg), (0, 0), (0, 0)))
                gs = jnp.pad(gseg_in, (0, (NTpad - NTg) * 8))
            return pl.pallas_call(
                functools.partial(_gather_kernel, tps=g_tps),
                out_shape=jax.ShapeDtypeStruct((NTpad, 8, LANES),
                                               A.vals.dtype),
                grid=(g_steps,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((g_tps, 8, LANES), lambda t: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((g_tps, 8, LANES),
                                       lambda t: (t, 0, 0),
                                       memory_space=pltpu.VMEM),
                interpret=interpret,
            )(gs, gl3, x2d_in)[:NTg]

        if A.col_blocks:
            # blocked gather: one call per column block, each with its
            # segment-relative ids and its x2d slice VMEM-resident
            outs = []
            for (lo, hi, slo, shi), (gs_b, gl_b) in zip(A.col_blocks,
                                                        A.gblocks):
                x2d_b = jax.lax.slice_in_dim(x2d, slo, shi)
                gath = run_gather(gs_b, gl_b, x2d_b)
                outs.append(gath.reshape(-1, LANES)[: hi - lo])
            rows = jnp.concatenate(outs)                  # [NS_real, 128]
            if rows.shape[0] < NS8:
                rows = jnp.pad(rows, ((0, NS8 - rows.shape[0]), (0, 0)))
            flat = rows.reshape(-1)
        else:
            flat = run_gather(A.gseg, A.glidx, x2d).reshape(-1)
        if A.plan.n > flat.shape[0]:
            flat = jnp.pad(flat, (0, A.plan.n - flat.shape[0]))
        permuted = _perm.apply_permutation(A.plan, flat,
                                           interpret=interpret)
        # per-class reductions over the concatenated tile blocks
        Ttot = A.ntiles
        g3 = permuted[: Ttot * 8 * LANES].reshape(Ttot, 8, LANES)
        parts = _reduce_all_classes(A.vals, g3, A.class_tiles, interpret)

    y_sorted = (jnp.concatenate(parts) if len(parts) > 1
                else (parts[0] if parts else jnp.zeros(nrow, A.vals.dtype)))
    if y_sorted.shape[0] < nrow:
        y_sorted = jnp.pad(y_sorted, (0, nrow - y_sorted.shape[0]))

    # restore natural row order (padded-y packs also compact here)
    if A.yplan is not None:
        y = _perm.apply_permutation(A.yplan, y_sorted, interpret=interpret)
    else:
        y = y_sorted
    if y.shape[0] > nrow:
        y = y[:nrow]
    if A.nv:
        # fold virtual hub-split rows back into their owners (sorted ids;
        # nv is tiny — hundreds of partials, not a hot path)
        y = y[:nrow_l] + jax.ops.segment_sum(
            y[nrow_l:nrow], A.hub_owner, num_segments=nrow_l,
            indices_are_sorted=True)
    if A.side_gpr is not None:
        y = y + spmv_gpr(A.side_gpr, x, interpret=interpret)
    if A.side.nnz:
        from ..ops.spmv import spmv_coo

        y = spmv_coo(A.side, x.astype(A.vals.dtype), y=y)
    return y


# ---------------------------------------------------------------------------
# GPR SpMM: the whole pipeline batched over right-hand sides
# ---------------------------------------------------------------------------


def _fused_gather_s1_rhs_kernel(gseg_ref, glidx_ref, x3_ref,
                                a2_ref, a3_ref, o_ref, *, rp128):
    """Gather + stage 1 for a block of rhs planes, gather batched ACROSS
    rhs: one dynamic middle-axis slice ``x3[:, seg, :]`` moves the qb
    planes' segment rows together, and one lane-gather (same index row
    broadcast over the qb sublanes) extracts all qb rhs's slot values —
    qb-fold fewer dynamic slices than the per-rhs loop (which measured
    8.2 ms at nrhs=32: ~260k single-sublane dynamic reads dominated).

    The per-rhs T-G-T-G is the stage's real cost (~2/3 of batched SpMM
    wall time, VPU-shuffle-byte-bound — tile COUNT is the only lever,
    which is why SpMM benefits most from the small-chunk fuller-tile
    packing; see CHUNK_NNZ).  Offloading alternate rhs's first transpose
    to the MXU (exact one-hot ``dot_general``) measured 378 -> 333
    ns/TGTG in an isolated kernel but was run-noise-neutral here (the
    gather/slice VPU work already overlaps) — probed and rejected,
    round 4."""
    t = pl.program_id(1)
    qb = x3_ref.shape[0]
    rows = []
    for i in range(rp128):
        blk = x3_ref[:, gseg_ref[t * rp128 + i], :]          # [qb, 128]
        idx = jnp.broadcast_to(
            glidx_ref[i].astype(jnp.int32)[None, :], (qb, LANES))
        rows.append(jnp.take_along_axis(blk, idx, axis=1))
    w = jnp.stack(rows)                                      # [rp128, qb, 128]
    z_all = jnp.swapaxes(w, 0, 1)                            # [qb, rp128, 128]
    if rp128 < LANES:
        z_all = jnp.pad(z_all, ((0, 0), (0, LANES - rp128), (0, 0)))
    for q2 in range(qb):
        o_ref[q2, 0] = _perm._tgtg(z_all[q2], a2_ref[0], a3_ref[0])


def _fused_s23_reduce_rhs_kernel(rowsrc_ref, z_ref, b2_ref, b3_ref,
                                 vals_ref, mask_ref, o_ref, *, tb, rp128):
    """Batched stages 2+3 + reduce: grid (rhs, tile-groups) with the rhs
    major so each rhs's exchange buffer stays VMEM-resident across its
    tile sweep while the plane/vals blocks cycle.  The group's tb
    products collapse into ONE ``[tb*rp128, 128] @ [128, 16]`` MXU pass
    (per-tile dots cost ~180ns each in step overhead)."""
    t0 = pl.program_id(1) * tb
    prods = []
    for i in range(tb):

        def stack8(s, i=i):
            base = (t0 + i) * LANES + s * 8
            return jnp.stack([z_ref[0, rowsrc_ref[base + j], :]
                              for j in range(8)])

        z = jnp.concatenate([stack8(s) for s in range(LANES // 8)], axis=0)
        w = _perm._tgtg(z, b2_ref[i], b3_ref[i])
        prods.append(w[:rp128] * vals_ref[i])
    prod = jnp.concatenate(prods, axis=0)
    out = lax.dot_general(
        prod, mask_ref[:], (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=_acc_dtype(prod.dtype),  # >=32-bit acc
    ).astype(prod.dtype)
    o_ref[0] = out.reshape(tb, rp128, 16)


def _fused_s23_reduce_rhs_kernel_v3(rowsrc_ref, z_ref, b2_ref, vals_ref,
                                    mt_ref, o_ref, *, tb):
    """Engine-v3 stage 2+3 + reduce: stack8 exchange -> multiply (vals in
    EXCHANGE layout) -> ONE transpose -> b2 gather -> transposed mask-dot
    ``[16, 128] @ [128, 128]``.  vs the v2 T-G-T-G form this drops the
    final transpose and the b3 gather (~330 ns/tile measured,
    tools/probe_engine_v3.py); partials come out ``[16, 128(vals row)]``
    per tile and are re-oriented by XLA outside (cheap: ~750 KB)."""
    t0 = pl.program_id(1) * tb
    for i in range(tb):

        def stack8(s, i=i):
            base = (t0 + i) * LANES + s * 8
            return jnp.stack([z_ref[0, rowsrc_ref[base + j], :]
                              for j in range(8)])

        z = jnp.concatenate([stack8(s) for s in range(LANES // 8)], axis=0)
        prod = z * vals_ref[i]
        prod = prod.T
        prod = jnp.take_along_axis(prod, b2_ref[i].astype(jnp.int32),
                                   axis=1)
        o_ref[0, i] = lax.dot_general(
            mt_ref[:], prod, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=_acc_dtype(prod.dtype),  # >=32-bit acc
        ).astype(prod.dtype)


def _run_s23_reduce_fused_batched(A: GPCSR, z: jax.Array, *,
                                  interpret: bool = False) -> jax.Array:
    """``z [nrhs, T*128, 128]`` → width-8 partials ``[nrhs, T, rp128, 16]``."""
    plan = A.plan
    rp128 = plan.real_per_tile // LANES
    T = plan.ntiles
    nrhs = int(z.shape[0])
    tb = min(_perm.TB_S23, T)
    nt = -(-T // tb)
    Tp = nt * tb
    b2, b3, rowsrc, vals = plan.b2, plan.b3, plan.rowsrc, A.vals
    if Tp != T:
        pad_t = ((0, Tp - T), (0, 0), (0, 0))
        b2 = jnp.pad(b2, pad_t)
        if not A.fused_v3:
            # v3 plans carry a [1,1,1] dummy b3 the kernel never reads
            b3 = jnp.pad(b3, pad_t)
        vals = jnp.pad(vals, pad_t)
        rowsrc = jnp.pad(rowsrc, (0, (Tp - T) * LANES))
    if A.fused_v3:
        mask_t = jnp.asarray(_mask16(A.vals.dtype)).T     # [16, 128]
        P = pl.pallas_call(
            functools.partial(_fused_s23_reduce_rhs_kernel_v3, tb=tb),
            out_shape=jax.ShapeDtypeStruct((nrhs, Tp, 16, LANES),
                                           A.vals.dtype),
            grid=(nrhs, nt),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),       # rowsrc
                pl.BlockSpec((1, T * LANES, LANES),
                             lambda q, tg: (q, 0, 0),
                             memory_space=pltpu.VMEM),       # z, per-rhs
                pl.BlockSpec((tb, LANES, LANES),
                             lambda q, tg: (tg, 0, 0),
                             memory_space=pltpu.VMEM),       # b2
                pl.BlockSpec((tb, LANES, LANES),
                             lambda q, tg: (tg, 0, 0),
                             memory_space=pltpu.VMEM),       # vals
                pl.BlockSpec(memory_space=pltpu.VMEM),       # mask_t
            ],
            out_specs=pl.BlockSpec((1, tb, 16, LANES),
                                   lambda q, tg: (q, tg, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(rowsrc, z, b2, vals, mask_t)[:, :T]
        # [nrhs, T, 16(partial), 128(vals row)] -> the v2 orientation
        return jnp.swapaxes(P, -1, -2)[:, :, :rp128, :]
    out = pl.pallas_call(
        functools.partial(_fused_s23_reduce_rhs_kernel, tb=tb,
                          rp128=rp128),
        out_shape=jax.ShapeDtypeStruct((nrhs, Tp, rp128, 16), A.vals.dtype),
        grid=(nrhs, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # rowsrc
            pl.BlockSpec((1, T * LANES, LANES), lambda q, tg: (q, 0, 0),
                         memory_space=pltpu.VMEM),           # z, per-rhs
            pl.BlockSpec((tb, LANES, LANES), lambda q, tg: (tg, 0, 0),
                         memory_space=pltpu.VMEM),           # b2
            pl.BlockSpec((tb, LANES, LANES), lambda q, tg: (tg, 0, 0),
                         memory_space=pltpu.VMEM),           # b3
            pl.BlockSpec((tb, rp128, LANES), lambda q, tg: (tg, 0, 0),
                         memory_space=pltpu.VMEM),           # vals
            pl.BlockSpec(memory_space=pltpu.VMEM),           # mask16
        ],
        out_specs=pl.BlockSpec((1, tb, rp128, 16),
                               lambda q, tg: (q, tg, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rowsrc, z, b2, b3, vals, _mask16(A.vals.dtype))
    return out[:, :T]


#: nrhs ceiling for the batched pipeline.  Measured on engine v2
#: (tools/profile_spmm.py, 700k-nnz random): batched is 2.0x the mapped
#: path at nrhs=4 but parity within noise from 16 up — the per-rhs
#: payload work (gathers/transposes/exchange re-run per rhs in BOTH
#: paths) dominates once launch overhead is amortized, and the batched
#: grid still re-fetches planes/vals per rhs sweep.  Re-swept on engine
#: v3 (round 3, same-process 32-RHS sweep on the same matrix): qb
#: 2/4/8/16/32 -> 3.77/3.75/3.23/3.74/3.91 ms — the v3 stage-2/3's
#: cheaper per-tile cost moves the sweet spot to 8.  Module-level so
#: probes can override.
SPMM_BATCH_MAX_NRHS = 8


def _spmm_gpr_batched_main(A: GPCSR, X: jax.Array, *,
                           interpret: bool = False) -> jax.Array:
    """The batched pipeline on the MAIN pack only (no side paths):
    returns y_sorted-restored ``[nrhs, nrow]`` (transposed layout)."""
    nrow, ncol = A.shape
    nrhs = int(X.shape[1])
    plan = A.plan
    rp128 = plan.real_per_tile // LANES
    S = -(-ncol // LANES)
    Xt = X.T.astype(A.vals.dtype)                     # [nrhs, ncol]
    if S * LANES != ncol:
        Xt = jnp.pad(Xt, ((0, 0), (0, S * LANES - ncol)))
    x3 = Xt.reshape(nrhs, S, LANES)
    z = _spmm_stage1(A, x3, interpret=interpret)
    P = _run_s23_reduce_fused_batched(
        A, z.reshape(nrhs, plan.ntiles * LANES, LANES),
        interpret=interpret)
    return _spmm_reduce_restore(
        A, P.reshape(nrhs, plan.ntiles * rp128, 16), interpret=interpret)


def _spmm_stage1(A: GPCSR, x3: jax.Array, *,
                 interpret: bool = False) -> jax.Array:
    """Fused gather + permutation stage 1 over all rhs planes:
    ``x3 [nrhs, S, 128]`` → ``z [nrhs, T, 128, 128]``."""
    plan = A.plan
    rp128 = plan.real_per_tile // LANES
    nrhs, S = int(x3.shape[0]), int(x3.shape[1])
    T = plan.ntiles
    # rhs per grid step: as many x planes as ~2 MB of VMEM allows —
    # fat steps keep the (rhs, tiles) grid near the unbatched step
    # count (skinny 1-rhs steps made SpMM SLOWER than nrhs SpMVs), but
    # the block must leave room for double buffering (qb=8 at S=782
    # measured 2x SLOWER than qb=4: the 3.2 MB x3 block + z out blocks
    # overflowed VMEM headroom)
    itemsize = jnp.dtype(A.vals.dtype).itemsize
    qb_cap = max(1, min(_perm.QB_S1,
                        (2 << 20) // (S * LANES * itemsize), nrhs))
    # pick qb by the stage's cost model: each tile-sweep pays a fixed
    # ~0.7us step cost plus ~672ns per rhs SLOT (padded slots' T-G-T-G —
    # the stage's dominant op — runs on dead data too).  Blindly taking
    # the cap wastes slots (groups of 8 at the S=782 cap of 5 ran 10
    # slots for 8 real rhs — 25% of stage 1; fixed round 4, 2.8 -> 2.47
    # ms SpMM32), while forcing exact divisors collapses prime nrhs to
    # the skinny qb=1 steps measured ~2x slower.
    qb = min(range(1, qb_cap + 1),
             key=lambda q: -(-nrhs // q) * (700 + q * 672))
    nq = -(-nrhs // qb)
    if nq * qb != nrhs:
        x3 = jnp.pad(x3, ((0, nq * qb - nrhs), (0, 0), (0, 0)))
    t_plane = pl.BlockSpec((1, LANES, LANES), lambda qg, t: (t, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fused_gather_s1_rhs_kernel, rp128=rp128),
        out_shape=jax.ShapeDtypeStruct((nq * qb, T, LANES, LANES),
                                       A.vals.dtype),
        grid=(nq, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # gseg
            pl.BlockSpec((rp128, LANES), lambda qg, t: (t, 0),
                         memory_space=pltpu.VMEM),       # glidx
            pl.BlockSpec((qb, S, LANES), lambda qg, t: (qg, 0, 0),
                         memory_space=pltpu.VMEM),       # x planes
            t_plane, t_plane,
        ],
        out_specs=pl.BlockSpec((qb, 1, LANES, LANES),
                               lambda qg, t: (qg, t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A.gseg, A.glidx, x3, plan.a2, plan.a3)[:nrhs]


def _spmm_reduce_restore(A: GPCSR, P2: jax.Array, *,
                         interpret: bool = False) -> jax.Array:
    """Batched class combine + y-order restore: width-8 partials
    ``P2 [nrhs, T*rp128, 16]`` → ``[nrhs, nrow]``."""
    nrow_l = A.shape[0]
    nrow = nrow_l + A.nv
    nrhs = int(P2.shape[0])
    parts = _combine_partials(P2, A.class_tiles)
    y_sorted = (jnp.concatenate(parts, axis=1) if len(parts) > 1
                else (parts[0] if parts
                      else jnp.zeros((nrhs, nrow), A.vals.dtype)))
    if y_sorted.shape[1] < nrow:
        y_sorted = jnp.pad(y_sorted,
                           ((0, 0), (0, nrow - y_sorted.shape[1])))
    if A.yplan is not None:
        y_sorted = _perm.apply_permutation_batched(
            A.yplan, y_sorted, interpret=interpret)
    if y_sorted.shape[1] > nrow:
        y_sorted = y_sorted[:, :nrow]
    if A.nv:
        fold = jax.vmap(lambda e: jax.ops.segment_sum(
            e, A.hub_owner, num_segments=nrow_l, indices_are_sorted=True))
        y_sorted = y_sorted[:, :nrow_l] + fold(y_sorted[:, nrow_l:nrow])
    return y_sorted


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmm_gpr(A: GPCSR, X: jax.Array, *, interpret: bool = False
             ) -> jax.Array:
    """``A @ X`` for ``X [ncol, nrhs]`` — the pipeline batched over rhs.

    Every stage runs as ONE launch with an (rhs, tiles) grid ordered so
    the expensive loop-invariant operand stays VMEM-resident: the x2d
    plane per rhs in the fused gather/stage-1, the exchange buffer per
    rhs in stage 2+3, the values block per step in the reduce.  Compared
    to ``lax.map`` over per-rhs SpMVs this amortizes both the per-launch
    fixed cost (~90us x nrhs) and the index-plane traffic.

    Falls back to the mapped per-rhs pipeline when the pack is not
    stage-1-fusable (two-level plans).
    """
    _check_s1_present(A, "spmm_gpr")
    nrhs = int(X.shape[1])
    if not A.fused:
        # the mapped per-rhs SpMVs already include side/side_gpr — return
        # directly (adding them again double-counted hub-row tails)
        cols = jax.lax.map(
            lambda v: spmv_gpr(A, v, interpret=interpret), X.T)
        return cols.T
    qb = max(1, SPMM_BATCH_MAX_NRHS)
    if nrhs <= qb:
        y = _spmm_gpr_batched_main(A, X, interpret=interpret).T
    else:
        # beyond the batched sweet spot, map over GROUPS of qb rhs: the
        # group keeps the 2x batched win (measured at nrhs=4) while the
        # map bounds the live z buffers (one group's worth at a time)
        ng = -(-nrhs // qb)
        Xp = X if ng * qb == nrhs else jnp.pad(
            X, ((0, 0), (0, ng * qb - nrhs)))
        groups = jnp.moveaxis(
            Xp.reshape(X.shape[0], ng, qb), 1, 0)        # [ng, ncol, qb]
        Yg = jax.lax.map(
            lambda Xg: _spmm_gpr_batched_main(A, Xg, interpret=interpret),
            groups)                                      # [ng, qb, nrow]
        y = Yg.reshape(ng * qb, -1)[:nrhs].T
    if A.side_gpr is not None:
        y = y + spmm_gpr(A.side_gpr, X, interpret=interpret)
    if A.side.nnz:
        from ..ops.spmm import spmm_coo

        y = y + spmm_coo(A.side, X.astype(A.vals.dtype))
    return y


# ---------------------------------------------------------------------------
# Row-chunked GPR: arbitrary nnz via per-chunk plans
# ---------------------------------------------------------------------------


@sparse_dataclass
class ChunkFold:
    """Cross-chunk fused operands (built when every chunk of a
    :class:`GPCSRChunked` is a single-block fused pack with the SAME
    stage-1 tile fill).  Collapses the per-chunk fixed launch costs:

    - stage 1 runs as ONE pallas call over the concatenated tile axis
      (gseg/glidx index the global x2d — no rebasing), instead of one
      launch per chunk;
    - the per-chunk y reorders (2 launches each) compose into ONE global
      permutation over the concatenated class-sorted outputs, and the
      per-chunk hub folds into ONE segment-sum.

    Stage 2/3 stays per chunk: its exchange needs the chunk's whole z
    VMEM-resident, which is exactly the chunking cap.
    """

    gseg: jax.Array      # [sum_T*rp128] int32 — x2d row per gather sublane
    glidx: jax.Array     # [sum_T*rp128, 128] int8
    a2: jax.Array        # [sum_T, 128, 128] int8
    a3: jax.Array
    yplan: object        # PermutationPlan | TwoLevelPlan | None
    hub_owner: object    # [nv] int32 global owner rows, or None
    rp128: int = static_field()
    tile_counts: tuple = static_field()      # T per chunk
    sorted_lens: tuple = static_field()      # internal rows per chunk
    nv: int = static_field(default=0)


@sparse_dataclass
class GPCSRChunked:
    """Row-block-chunked GPR matrix: each chunk owns <= MAX_NNZ entries and
    its own permutation plan; chunk outputs concatenate (row blocks are
    contiguous).  Lifts the single-level routing cap to arbitrary nnz.
    ``fold`` (when present) carries the cross-chunk fused operands that
    collapse per-chunk launch overhead — see :class:`ChunkFold`."""

    chunks: tuple        # tuple of GPCSR (pytree children)
    shape: tuple[int, int] = static_field()
    nnz: int = static_field()
    row_splits: tuple[int, ...] = static_field()
    fold: object = None  # ChunkFold | None

    @property
    def dtype(self):
        return self.chunks[0].dtype


def pack_gpr_chunked(mat, *, dtype=np.float32,
                     chunk_nnz: int = CHUNK_NNZ) -> GPCSRChunked:
    """Pack a scipy CSR of any size: split rows into blocks of
    ~``chunk_nnz`` entries, pack each independently.

    Blocks whose routing comes out TWO-LEVEL (skewed flows can break the
    single-level row budget well below the nominal ~900k cap — observed
    on power-law column distributions) are split in half and re-packed:
    every chunk then runs the fused two-launch pipeline, which is worth
    far more than fewer chunks (a two-level chunk runs the generic
    3-launch path at ~2.5x the cost)."""
    csr = mat.tocsr()
    csr.sort_indices()
    nrow, ncol = csr.shape
    indptr = np.asarray(csr.indptr, dtype=np.int64)
    nnz = int(indptr[-1])

    def cut(lo, target):
        # cut BEFORE the row that crosses the target (never after —
        # overshoot past MAX_NNZ used to fail the whole pack, ADVICE r1);
        # a single row heavier than the target becomes its own block,
        # whose >128 tail spills to the side path inside pack_gpr
        hi = int(np.searchsorted(indptr, indptr[lo] + target,
                                 side="right")) - 1
        return min(max(hi, lo + 1), nrow)

    def v3_split_retry(lo, hi, p, ho, rp_hint):
        """A big fused block that landed on v2 (the v3 ladder found no
        coloring — hub-heavy heads of skewed distributions): try ONE
        split into halves, which typically route v3 at the smaller fill
        (measured: power-law 700k-nnz head chunk fails, its ~350k halves
        route).  Halves are forced to the block's own rp128 so the
        chunk-fold stays coherent; kept only if BOTH halves land v3."""
        nnz_blk = int(indptr[hi]) - int(indptr[lo])
        if (not ENGINE_V3 or p.fused_v3 or not p.fused or hi - lo <= 1
                or nnz_blk < 400_000):
            return [(lo, hi, p, ho)]
        hint = rp_hint
        if hint is None and "s1" in ho:
            hint = int(ho["s1"]["rp128"])
        mid = cut(lo, max(nnz_blk // 2, 1))
        if mid >= hi or mid <= lo:
            return [(lo, hi, p, ho)]
        try:
            halves = (pack_block(lo, mid, 4, hint, v3_retry=False)
                      + pack_block(mid, hi, 4, hint, v3_retry=False))
        except ValueError:
            return [(lo, hi, p, ho)]
        if all(q.fused_v3 for (_, _, q, _) in halves):
            return halves
        return [(lo, hi, p, ho)]

    def pack_block(lo, hi, depth=0, rp_hint=None, v3_retry=True):
        last = hi - lo <= 1 or depth >= 4
        if rp_hint is not None:
            # try the sibling chunks' stage-1 tile fill first: a shared
            # rp128 is what lets the chunk-fold concatenate ONE stage-1
            # grid.  A forced fill that cannot route just falls through
            # to the natural pack (fold then degrades, nothing breaks).
            ho: dict = {}
            try:
                p = pack_gpr(csr[lo:hi], dtype=dtype, host_out=ho,
                             defer_s1=True, force_rp=rp_hint,
                             device=False)
                if v3_retry:
                    return v3_split_retry(lo, hi, p, ho, rp_hint)
                return [(lo, hi, p, ho)]
            except ValueError:
                pass
        ho = {}
        try:
            # fail BEFORE any coloring/upload when the block needs
            # two-level routing (the feasibility search is pure budget
            # arithmetic) — splitting is cheaper than a discarded pack.
            # Stage-1 planes stay host-side (defer_s1): uploaded ONCE,
            # either concatenated into the fold or rehydrated per chunk.
            p = pack_gpr(csr[lo:hi], dtype=dtype,
                         single_level_only=not last, host_out=ho,
                         defer_s1=True, device=False)
        except ValueError:
            if last:
                raise
            mid = cut(lo, max((int(indptr[hi]) - int(indptr[lo])) // 2, 1))
            if mid >= hi:
                ho = {}
                return [(lo, hi, pack_gpr(csr[lo:hi], dtype=dtype,
                                          host_out=ho, defer_s1=True,
                                          device=False), ho)]
            return (pack_block(lo, mid, depth + 1, rp_hint)
                    + pack_block(mid, hi, depth + 1, rp_hint))
        if v3_retry:
            return v3_split_retry(lo, hi, p, ho, rp_hint)
        return [(lo, hi, p, ho)]

    blocks = []
    lo = 0
    rp_hint = None
    # balanced targets: ceil(nnz/chunk_nnz) blocks of ~equal nnz, the
    # target recomputed from the REMAINING nnz each cut (cut() rounds
    # down to a row boundary, so a fixed target accumulates undershoot
    # into a sliver block — [39, 39, 1]-tile packs observed at 700k nnz /
    # 350k chunks, a full launch set for 1 tile of work; the last block
    # swallows the tail instead)
    nblocks = max(1, -(-nnz // max(chunk_nnz, 1)))
    # plan all cuts up front (cheap indptr arithmetic), pack block 0
    # synchronously (it sets the shared rp_hint the chunk-fold needs),
    # then pack the remaining blocks on a thread pool: the work is host
    # numpy (releases the GIL for large ops) + the OpenMP C++ router
    # (ctypes releases the GIL for the call), on disjoint csr[lo:hi]
    # copies.  Measured on the 5M-nnz power-law (15 chunks, 4 cores):
    # pack 6.4 -> ~3 s host-side.
    cuts = []
    i = 0
    while lo < nrow:
        remaining = nnz - int(indptr[lo])
        target = -(-remaining // max(nblocks - i, 1))
        hi = cut(lo, target)
        cuts.append((lo, hi))
        i += 1
        lo = hi
    if not cuts:                       # 0-row matrix: empty pack
        return GPCSRChunked(chunks=(), shape=(int(nrow), int(ncol)),
                            nnz=nnz, row_splits=(0,), fold=None)
    first = pack_block(*cuts[0], rp_hint=rp_hint)
    blocks.extend(first)
    if rp_hint is None:
        for (_, _, _, h) in first:
            if "s1" in h:
                rp_hint = int(h["s1"]["rp128"])
                break
    if len(cuts) > 2:
        import concurrent.futures as _cf

        # one ROUTING worker per core (the main thread only blocks on
        # results after block 0; 3 -> 4 measured ~0.4 s off the 5M
        # pack), plus ONE dedicated uploader thread: device_put of a
        # finished block's pack overlaps COMPLETELY with the other
        # blocks' GIL-holding numpy routing (measured: an 80 MB fresh
        # transfer hides to zero under 2 s of fancy indexing — round 5).
        # Uploads must NOT run in the routing workers themselves: that
        # steals a routing slot and serializes (measured 1.5x slower).
        nw = min(max((os.cpu_count() or 4), 1), 4)
        with _cf.ThreadPoolExecutor(max_workers=nw) as ex, \
                _cf.ThreadPoolExecutor(max_workers=1) as up:

            def ship(entries):
                return [(lo_, hi_, up.submit(jax.device_put, p_), ho_)
                        for (lo_, hi_, p_, ho_) in entries]

            staged = ship(blocks)
            blocks = []
            futs = [ex.submit(
                        lambda a, b: ship(pack_block(a, b,
                                                     rp_hint=rp_hint)),
                        lo_i, hi_i)
                    for (lo_i, hi_i) in cuts[1:]]
            for f in futs:
                staged.extend(f.result())
            blocks = [(lo_, hi_, pf.result(), ho_)
                      for (lo_, hi_, pf, ho_) in staged]
    else:
        for (lo_i, hi_i) in cuts[1:]:
            blocks.extend(pack_block(lo_i, hi_i, rp_hint=rp_hint))
    splits = [0] + [hi for (_, hi, _, _) in blocks]
    fold = _build_chunk_fold(blocks, nrow) if len(blocks) > 1 else None
    if fold is None:
        # no fold -> the per-chunk pipelines are the consumers: upload
        # the deferred stage-1 planes now (single upload either way)
        chunks = [_rehydrate_s1(p, ho) for (_, _, p, ho) in blocks]
    else:
        chunks = [p for (_, _, p, _) in blocks]
    out = GPCSRChunked(
        chunks=tuple(chunks),
        shape=(int(nrow), int(ncol)),
        nnz=nnz,
        row_splits=tuple(splits),
        fold=fold,
    )
    # ONE batched device_put for every chunk + the fold (round 5: the
    # 5M-nnz power-law pack paid ~2 s in ~340 per-array transfers)
    return jax.device_put(out)


def _rehydrate_s1(c: GPCSR, ho: dict) -> GPCSR:
    """Upload a defer_s1 pack's stage-1 planes from its host_out dict
    (used when no :class:`ChunkFold` engages to own them)."""
    if not c.fused or "s1" not in ho or int(c.gseg.shape[0]) != 0:
        return c
    s1 = ho["s1"]
    return dataclasses.replace(
        c, gseg=np.asarray(s1["gseg"]), glidx=np.asarray(s1["glidx"]),
        plan=dataclasses.replace(c.plan, a2=np.asarray(s1["a2"]),
                                 a3=np.asarray(s1["a3"])))


def _build_chunk_fold(blocks, nrow: int):
    """Assemble the :class:`ChunkFold` from the packs' host_out pieces —
    pure host numpy (never reads device leaves back).  Returns None when
    any chunk is ineligible: non-fused (two-level plan or column-blocked
    gather), carrying a side path, or with a stage-1 tile fill different
    from the first chunk's (the concatenated grid needs ONE static
    rp128)."""
    pcs = [p for (_, _, p, _) in blocks]
    hos = [h for (_, _, _, h) in blocks]
    if not all(p.fused and not p.col_blocks and p.side.nnz == 0
               and p.side_gpr is None and "s1" in h
               for p, h in zip(pcs, hos)):
        return None
    rp128 = hos[0]["s1"]["rp128"]
    if any(h["s1"]["rp128"] != rp128 for h in hos):
        return None

    # ---- global y reorder: concat(class-sorted chunk outputs) ->
    # [natural global rows..., all chunks' virtual hub rows...] ----------
    nint = [h["nrow_internal"] for h in hos]
    soff = np.zeros(len(nint) + 1, dtype=np.int64)
    np.cumsum(nint, out=soff[1:])
    nv_total = int(sum(len(h["hub_owner"]) for h in hos))
    gperm = np.empty(nrow + nv_total, dtype=np.int64)
    owners = []
    vbase = nrow
    for (lo, hi, _, _), h, off in zip(blocks, hos, soff[:-1]):
        nreal = hi - lo
        pos = h["y_pos"]
        if pos is None:
            pos = np.arange(h["nrow_internal"], dtype=np.int64)
        gperm[lo:hi] = off + pos[:nreal]
        nv_c = len(h["hub_owner"])
        if nv_c:
            gperm[vbase:vbase + nv_c] = off + pos[nreal:]
            owners.append(h["hub_owner"].astype(np.int32) + lo)
            vbase += nv_c
    yplan = (None if np.array_equal(gperm, np.arange(len(gperm)))
             else _perm.plan_permutation_auto(gperm, device=False))

    # numpy leaves: the chunked pack's single device_put uploads the fold
    return ChunkFold(
        gseg=np.concatenate([h["s1"]["gseg"] for h in hos]),
        glidx=np.concatenate([h["s1"]["glidx"] for h in hos]),
        a2=np.concatenate([h["s1"]["a2"] for h in hos]),
        a3=np.concatenate([h["s1"]["a3"] for h in hos]),
        yplan=yplan,
        hub_owner=(np.concatenate(owners).astype(np.int32)
                   if owners else None),
        rp128=int(rp128),
        tile_counts=tuple(int(h["s1"]["T"]) for h in hos),
        sorted_lens=tuple(int(n) for n in nint),
        nv=nv_total,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmv_gpr_chunked(A: GPCSRChunked, x: jax.Array, *,
                     interpret: bool = False) -> jax.Array:
    """``A @ x`` over row chunks; outputs concatenate in row order.

    With a :class:`ChunkFold` the launch count drops from ~4 per chunk
    (stage 1, stage 2/3, y-reorder x2) to ``nchunks + 3`` total: one
    concatenated stage-1 grid, one stage-2/3 per chunk (its exchange
    needs the chunk's z VMEM-resident — that IS the chunking cap), one
    composed global y permutation, one global hub fold."""
    if A.fold is not None:
        return _spmv_chunked_folded(A, x, interpret=interpret)
    parts = [spmv_gpr(c, x, interpret=interpret) for c in A.chunks]
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def _spmv_chunked_folded(A: GPCSRChunked, x: jax.Array, *,
                         interpret: bool = False) -> jax.Array:
    fold: ChunkFold = A.fold
    nrow, ncol = A.shape
    S = -(-ncol // LANES)
    dtype = A.dtype
    xpad = jnp.pad(x, (0, S * LANES - ncol)) if S * LANES != ncol else x
    x2d = xpad.reshape(S, LANES).astype(dtype)

    # ONE gather+stage-1 launch over the concatenated tile axis
    z_all = _stage1_call(fold.gseg, fold.glidx, x2d, fold.a2, fold.a3,
                         rp128=fold.rp128, dtype=dtype,
                         interpret=interpret)

    # per-chunk exchange + stage-3 + mask-dot reduce (z slice stays on
    # device; the slice boundaries are static)
    sorted_parts = []
    off = 0
    for c, T_c, n_int in zip(A.chunks, fold.tile_counts,
                             fold.sorted_lens):
        z_c = lax.slice_in_dim(z_all, off, off + T_c)
        off += T_c
        P = _run_s23_reduce_fused(c, z_c, interpret=interpret)
        rp128 = c.plan.real_per_tile // LANES
        parts = _combine_partials(
            P.reshape(c.plan.ntiles * rp128, 16), c.class_tiles)
        y_c = (jnp.concatenate(parts) if len(parts) > 1
               else (parts[0] if parts else jnp.zeros(n_int, dtype)))
        if y_c.shape[0] < n_int:
            y_c = jnp.pad(y_c, (0, n_int - y_c.shape[0]))
        sorted_parts.append(y_c)
    y_sorted = (jnp.concatenate(sorted_parts) if len(sorted_parts) > 1
                else sorted_parts[0])

    # ONE composed y reorder (class-sorted chunk concat -> natural global
    # rows, virtual hub rows at the tail), then ONE global hub fold
    if fold.yplan is not None:
        y = _perm.apply_permutation(fold.yplan, y_sorted,
                                    interpret=interpret)
    else:
        y = y_sorted
    if fold.nv:
        # per-chunk owners are sorted and chunks are ascending row
        # blocks, so the concatenated owners stay globally sorted
        y = y[:nrow] + jax.ops.segment_sum(
            y[nrow:nrow + fold.nv], fold.hub_owner, num_segments=nrow,
            indices_are_sorted=True)
    else:
        y = y[:nrow]
    return y


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmm_gpr_chunked(A: GPCSRChunked, X: jax.Array, *,
                     interpret: bool = False) -> jax.Array:
    """``A @ X`` over row chunks (each chunk runs the batched pipeline).

    Fold-owning packs keep ONE copy of the stage-1 planes (in the fold —
    ADVICE r2); each chunk's slice is re-materialized here by static
    ``lax.slice_in_dim`` (a transient in-jit copy, ~µs against the ms
    SpMM, never persisted in HBM or checkpoints)."""
    chunks = (A.chunks if A.fold is None
              else [_chunk_with_fold_s1(A.fold, c, i)
                    for i, c in enumerate(A.chunks)])
    parts = [spmm_gpr(c, X, interpret=interpret) for c in chunks]
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def _chunk_with_fold_s1(fold: "ChunkFold", c: GPCSR, i: int) -> GPCSR:
    """Rebuild chunk ``i``'s stage-1 operands as static slices of the
    fold's concatenated planes (tile axis = per-chunk tile counts)."""
    if int(c.gseg.shape[0]) != 0:
        return c                      # chunk still owns its planes
    t0 = sum(fold.tile_counts[:i])
    T_c = fold.tile_counts[i]
    rp = fold.rp128
    return dataclasses.replace(
        c,
        gseg=lax.slice_in_dim(fold.gseg, t0 * rp, (t0 + T_c) * rp),
        glidx=lax.slice_in_dim(fold.glidx, t0 * rp, (t0 + T_c) * rp),
        plan=dataclasses.replace(
            c.plan,
            a2=lax.slice_in_dim(fold.a2, t0, t0 + T_c),
            a3=lax.slice_in_dim(fold.a3, t0, t0 + T_c)))
