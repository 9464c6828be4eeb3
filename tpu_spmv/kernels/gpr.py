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
   MXU contraction, rows stay in natural order).

Envelope: ``ncol <= 3M`` (x2d VMEM-resident) and ``nnz <= ~800k`` per
permutation plan; :func:`pack_gpr_chunked` lifts the nnz cap by splitting
rows into blocks with independent plans (outputs concatenate).  Hub rows
wider than the lane budget spill to a COO side matrix (or recurse through
GPR when routable).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.base import sparse_dataclass, static_field
from ..formats.coo import COO
from . import permute as _perm

__all__ = ["GPCSR", "pack_gpr", "spmv_gpr", "GPCSRChunked",
           "pack_gpr_chunked", "spmv_gpr_chunked", "supports"]

LANES = 128
K_CHOICES = (16, 8, 4, 2, 1)
MAX_NNZ = 800_000


@sparse_dataclass
class GPCSR:
    """Packed operands for the gather–permute–reduce SpMV.

    Leaves:
      gseg: ``[NS] int32`` x2d row per gather sublane.
      glidx: ``[NS, 128] int32`` lane index (col % 128) per gather slot.
      plan: :class:`~tpu_spmv.kernels.permute.PermutationPlan` moving
        gathered values into PSELL slot order.
      vals: ``[T, 8, 128]`` pre-permuted values (zero padding).
      side: COO overflow (hub rows).
    Static: shape, nnz, rows-per-sublane k.
    """

    gseg: jax.Array
    glidx: jax.Array
    plan: _perm.PermutationPlan
    vals: jax.Array
    side: COO                      # residual overflow (small; XLA path)
    side_gpr: object               # GPCSR | None — big spills recurse
    shape: tuple[int, int] = static_field()
    nnz: int = static_field()
    rows_per_sublane: int = static_field()

    @property
    def ntiles(self) -> int:
        return int(self.vals.shape[0])

    @property
    def nsub(self) -> int:
        return int(self.glidx.shape[0])

    @property
    def lane_width(self) -> int:
        return LANES // self.rows_per_sublane


def supports(shape, nnz) -> bool:
    return shape[1] <= 3_000_000 and nnz <= MAX_NNZ


def pack_gpr(mat, *, dtype=np.float32, rows_per_sublane: int | None = None,
             _depth: int = 0) -> GPCSR:
    """Pack a scipy matrix (or host COO) for the GPR pipeline."""
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
    if nnz > MAX_NNZ:
        raise ValueError(f"nnz={nnz} > {MAX_NNZ}: chunk by row blocks")
    row_ids = np.repeat(np.arange(nrow, dtype=np.int64), np.diff(indptr))
    counts = np.diff(indptr)

    # ---- choose k (PSELL side) + spill hub rows --------------------------
    # minimize permutation slot count (T*1024) plus a spill penalty — the
    # single-level routing cap applies to SLOTS, so utilization dominates
    if rows_per_sublane is None:
        best_k, best_cost = 1, float("inf")
        for cand in K_CHOICES:
            W = LANES // cand
            spill = nnz - int(np.minimum(counts, W).sum()) if nnz else 0
            if nnz and spill > 0.10 * nnz:
                continue
            T_c = max(-(-nrow // (8 * cand)), 1)
            cost = T_c * 8 * LANES + 4 * spill
            if cost < best_cost:
                best_k, best_cost = cand, cost
        k = best_k
    else:
        k = int(rows_per_sublane)
    W = LANES // k
    offs = np.arange(nnz, dtype=np.int64) - indptr[row_ids]
    main = offs < W
    side_rows, side_cols, side_data = (row_ids[~main], cols[~main],
                                       data[~main])
    side_gpr = None
    if len(side_rows) > max(20_000, 0.05 * nnz) and _depth < 2:
        # big spills (wide rows on narrow-k packings) would crawl through
        # the XLA fallback — try recursing (each level strips another W per
        # row).  Very sparse side content can make the routed slot space
        # infeasible; fall back to the COO path in that case.
        import scipy.sparse as sp

        side_mat = sp.csr_matrix(
            (side_data, (side_rows, side_cols)), shape=(nrow, ncol)
        )
        try:
            side_gpr = pack_gpr(side_mat, dtype=dtype, _depth=_depth + 1)
            side_rows = side_cols = np.zeros(0, dtype=np.int64)
            side_data = np.zeros(0, dtype=dtype)
        except ValueError:
            side_gpr = None
    side = COO.from_arrays(side_rows, side_cols,
                           np.asarray(side_data, dtype=dtype),
                           (nrow, ncol), dtype=dtype)
    m_rows, m_cols, m_data, m_off = (row_ids[main], cols[main], data[main],
                                     offs[main])
    nm = len(m_rows)

    # ---- gather-side layout: segment-grouped slots -----------------------
    seg_order = np.argsort(m_cols >> 7, kind="stable")
    seg_sorted = (m_cols >> 7)[seg_order]
    # position within segment run; new sublane every 128 or at segment edge
    new_seg = np.ones(nm, dtype=bool)
    new_seg[1:] = seg_sorted[1:] != seg_sorted[:-1]
    run_start = np.maximum.accumulate(
        np.where(new_seg, np.arange(nm), 0))
    pos_in_seg = np.arange(nm) - run_start
    gsub = np.zeros(nm, dtype=np.int64)          # gather sublane per entry
    glane = pos_in_seg % LANES
    new_sub = new_seg | (pos_in_seg % LANES == 0)
    gsub = np.cumsum(new_sub) - 1
    NS = int(gsub[-1]) + 1 if nm else 1
    NS8 = -(-NS // 8) * 8                        # pad to whole 8-sublane tiles
    gseg = np.zeros(NS8, dtype=np.int32)
    gseg[gsub[new_sub]] = seg_sorted[new_sub]
    glidx = np.zeros((NS8, LANES), dtype=np.int32)
    glidx[gsub, glane] = (m_cols & 127)[seg_order]

    # ---- PSELL destination layout ---------------------------------------
    T = max(-(-nrow // (8 * k)), 1)
    d_lane = (m_rows % k) * W + m_off
    d_sub = (m_rows // k) % 8
    d_tile = m_rows // (8 * k)
    dst_flat = (d_tile * 8 + d_sub) * LANES + d_lane     # in [0, T*1024)

    vals_ps = np.zeros((T, 8, LANES), dtype=data.dtype)
    vals_ps[d_tile, d_sub, d_lane] = m_data

    # ---- permutation: gather slots -> PSELL slots ------------------------
    N = max(NS8 * LANES, T * 8 * LANES)
    src_flat = gsub * LANES + glane                      # in seg_order!
    perm = np.full(N, -1, dtype=np.int64)
    # entry e (in seg_order) sits at src_flat[e]; its destination is
    # dst_flat[seg_order[e]]
    perm[dst_flat[seg_order]] = src_flat
    free_dst = np.flatnonzero(perm < 0)
    used_src = np.zeros(N, dtype=bool)
    used_src[src_flat] = True
    perm[free_dst] = np.flatnonzero(~used_src)[: len(free_dst)]
    plan = _perm.plan_permutation(perm)

    return GPCSR(
        gseg=jnp.asarray(gseg),
        glidx=jnp.asarray(glidx),
        plan=plan,
        vals=jnp.asarray(vals_ps),
        side=side,
        side_gpr=side_gpr,
        shape=(int(nrow), int(ncol)),
        nnz=int(nnz),
        rows_per_sublane=k,
    )


#: tiles per grid step — 4KB per-tile blocks are DMA-overhead-bound, so
#: batch them (measured ~0.4us/tile at 1 tile/step).
TPS = 16


def _gather_kernel(gseg_ref, glidx_ref, x_ref, o_ref, *, tps):
    step = pl.program_id(0)

    def body(tb, _):
        base = (step * tps + tb) * 8
        tile = jnp.stack([x_ref[gseg_ref[base + i], :] for i in range(8)])
        o_ref[tb] = jnp.take_along_axis(tile, glidx_ref[tb], axis=1)
        return 0

    lax.fori_loop(0, tps, body, 0)


def _reduce_kernel(vals_ref, g_ref, mask_ref, o_ref, *, tps):
    def body(tb, _):
        prod = vals_ref[tb] * g_ref[tb]
        o_ref[tb] = lax.dot_general(
            prod, mask_ref[:], (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=prod.dtype,
        )
        return 0

    lax.fori_loop(0, tps, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmv_gpr(A: GPCSR, x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """``A @ x`` via gather -> permute -> reduce."""
    nrow, ncol = A.shape
    S = -(-ncol // LANES)
    xpad = jnp.pad(x, (0, S * LANES - ncol)) if S * LANES != ncol else x
    x2d = xpad.reshape(S, LANES).astype(A.vals.dtype)
    NS8 = A.nsub
    NT = NS8 // 8

    g_tps = min(TPS, NT)
    g_steps = -(-NT // g_tps)
    NTpad = g_steps * g_tps
    glidx3 = A.glidx.reshape(NT, 8, LANES)
    gseg_pad = A.gseg
    if NTpad != NT:
        glidx3 = jnp.pad(glidx3, ((0, NTpad - NT), (0, 0), (0, 0)))
        gseg_pad = jnp.pad(A.gseg, (0, (NTpad - NT) * 8))
    gathered = pl.pallas_call(
        functools.partial(_gather_kernel, tps=g_tps),
        out_shape=jax.ShapeDtypeStruct((NTpad, 8, LANES), A.vals.dtype),
        grid=(g_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((g_tps, 8, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g_tps, 8, LANES), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(gseg_pad, glidx3, x2d)
    gathered = gathered[:NT]

    flat = gathered.reshape(-1)
    if A.plan.n > flat.shape[0]:
        flat = jnp.pad(flat, (0, A.plan.n - flat.shape[0]))
    permuted = _perm.apply_permutation(A.plan, flat, interpret=interpret)

    T = A.ntiles
    k = A.rows_per_sublane
    W = A.lane_width
    lane_ids = np.arange(LANES) // W
    mask = jnp.asarray(
        (lane_ids[:, None] == np.arange(k)[None, :]), dtype=A.vals.dtype
    )
    g3 = permuted[: T * 8 * LANES].reshape(T, 8, LANES)
    r_tps = min(TPS, T)
    r_steps = -(-T // r_tps)
    Tpad = r_steps * r_tps
    vals3 = A.vals
    if Tpad != T:
        vals3 = jnp.pad(vals3, ((0, Tpad - T), (0, 0), (0, 0)))
        g3 = jnp.pad(g3, ((0, Tpad - T), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_reduce_kernel, tps=r_tps),
        out_shape=jax.ShapeDtypeStruct((Tpad, 8, k), A.vals.dtype),
        grid=(r_steps,),
        in_specs=[
            pl.BlockSpec((r_tps, 8, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tps, 8, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_tps, 8, k), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(vals3, g3, mask)
    y = out.reshape(-1)[:nrow]   # padding tiles sit past T*8*k >= nrow
    if A.side_gpr is not None:
        y = y + spmv_gpr(A.side_gpr, x, interpret=interpret)
    if A.side.nnz:
        from ..ops.spmv import spmv_coo

        y = spmv_coo(A.side, x.astype(A.vals.dtype), y=y)
    return y


# ---------------------------------------------------------------------------
# Row-chunked GPR: arbitrary nnz via per-chunk plans
# ---------------------------------------------------------------------------


@sparse_dataclass
class GPCSRChunked:
    """Row-block-chunked GPR matrix: each chunk owns <= MAX_NNZ entries and
    its own permutation plan; chunk outputs concatenate (row blocks are
    contiguous).  Lifts the single-level routing cap to arbitrary nnz."""

    chunks: tuple        # tuple of GPCSR (pytree children)
    shape: tuple[int, int] = static_field()
    nnz: int = static_field()
    row_splits: tuple[int, ...] = static_field()


def pack_gpr_chunked(mat, *, dtype=np.float32,
                     chunk_nnz: int = 700_000) -> GPCSRChunked:
    """Pack a scipy CSR of any size: split rows into blocks of
    ~``chunk_nnz`` entries, pack each independently."""
    csr = mat.tocsr()
    csr.sort_indices()
    nrow, ncol = csr.shape
    indptr = np.asarray(csr.indptr, dtype=np.int64)
    nnz = int(indptr[-1])
    targets = np.arange(chunk_nnz, nnz, chunk_nnz)
    cuts = np.searchsorted(indptr[1:], targets, side="left") + 1
    splits = [0] + sorted(set(int(c) for c in cuts if 0 < c < nrow)) + [nrow]
    chunks = []
    for lo, hi in zip(splits[:-1], splits[1:]):
        chunks.append(pack_gpr(csr[lo:hi], dtype=dtype))
    return GPCSRChunked(
        chunks=tuple(chunks),
        shape=(int(nrow), int(ncol)),
        nnz=nnz,
        row_splits=tuple(splits),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmv_gpr_chunked(A: GPCSRChunked, x: jax.Array, *,
                     interpret: bool = False) -> jax.Array:
    """``A @ x`` over row chunks; outputs concatenate in row order."""
    parts = [spmv_gpr(c, x, interpret=interpret) for c in A.chunks]
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]
