"""Hand-tiled Pallas ELL SpMV — the framework's native-tier gather kernel.

Why this exists: XLA's lowering of irregular gathers on TPU runs at
~0.13 Gvalues/s (measured), making XLA-level ELL/CSR SpMV 100-5000x slower
than the hardware allows.  The TPU *does* have a fast gather — the VPU's
``tpu.DynamicGatherOp`` — but only **within the 128-lane dimension** of a
tile, and only Pallas/Mosaic emits it (measured ~6-14 Gvalues/s, 50-100x
XLA).  This kernel is built around that constraint.

Layout ("packed sliced ELL", host-prepared by :func:`pack_ell`):

- ``x`` lives VMEM-resident as ``x2d[S, 128]`` (``x[c]`` at ``(c//128,
  c%128)``); a 128-column span of the matrix (a **segment**) maps to one
  x2d row.
- A tile is ``[8 sublanes, 128 lanes]``.  Each sublane packs ``k``
  **consecutive** rows, ``W = 128/k`` lanes per row — consecutive rows of
  local/banded matrices touch the same few segments, which is what keeps
  the gather-round count small.
- Per gather round ``m``, the kernel stacks 8 dynamically-indexed x2d rows
  (one segment per sublane) and issues ONE lane-gather for the whole tile;
  a per-lane round id selects which round each lane keeps.  ``M`` = max
  *distinct segments* per sublane (3-5 for a 5-point Laplacian at k=16).
- Row reduction is a per-tile ``[8,128] @ [128,k]`` matmul against a
  static block-diagonal 0/1 mask — MXU work, no reshapes, no shifts, and
  y comes out ``[8, k]`` block-aligned (rows stay in natural order; no
  global permutation anywhere).
- Rows wider than ``W`` spill their overflow entries into a small COO
  side matrix evaluated on the XLA path and added in (hub rows are rare;
  the side stays tiny).

Index planes are stored int8 (lane index < 128, round id < M <= 128) and
widened in-register — 4x less HBM traffic than int32 planes.

Reference analog: the ELL kernels of
`/root/reference/src/mat_vec.cpp:97-119,541-580` — same format role, but
the reference's NUMA variant mis-indexes column-major data (SURVEY.md Q4);
this kernel is oracle-tested like everything else.
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
from ..formats.csr import CSR
from ..formats.ell import ELL

__all__ = ["PackedELL", "pack_ell", "spmv_pallas", "spmm_pallas", "supports"]

#: tiles (8 sublanes x 128 lanes) per grid step — amortizes grid overhead.
TILES_PER_STEP = 64
LANES = 128
#: candidate rows-per-sublane (W = 128/k lanes per row).
K_CHOICES = (16, 8, 4, 2, 1)


@sparse_dataclass
class PackedELL:
    """Host-packed operand set for the Pallas ELL kernel.

    Leaves:
      vals: ``[T, 8, 128]`` values, zero in padding lanes.
      lidx: ``[T, 8, 128] int8`` lane index (col % 128) per entry.
      rnd:  ``[T, 8, 128] int8`` gather-round id per lane.
      seg:  ``[T, 8, M] int32`` x2d row (col // 128) per round per sublane.
      side: COO overflow matrix (rows wider than W), may be empty.
    Static: logical shape, true nnz, round count M, rows-per-sublane k.
    """

    vals: jax.Array
    lidx: jax.Array
    rnd: jax.Array
    seg: jax.Array
    side: COO
    shape: tuple[int, int] = static_field()
    nnz: int = static_field()
    rounds: int = static_field()
    rows_per_sublane: int = static_field()
    #: True → rounds are tile-wide (seg is [T, M]; ONE dynamic x2d slice
    #: broadcast to all 8 sublanes per round). False → per-sublane rounds
    #: (seg is [T, 8, M]; 8 slices per round).  Local matrices' sublanes
    #: share segments, so the uniform variant does 1/8th the slice work.
    tile_uniform: bool = static_field(default=False)

    @property
    def ntiles(self) -> int:
        return int(self.vals.shape[0])

    @property
    def lane_width(self) -> int:
        return LANES // self.rows_per_sublane

    @property
    def dtype(self):
        return self.vals.dtype

    def to_coo(self) -> COO:
        """Reconstruct the logical matrix (oracle checks, roofline)."""
        vals = np.asarray(self.vals)
        lidx = np.asarray(self.lidx).astype(np.int64)
        rnd = np.asarray(self.rnd).astype(np.int64)
        seg = np.asarray(self.seg).astype(np.int64)
        t, i, l = np.nonzero(vals)
        if self.tile_uniform:
            segs = seg[t, rnd[t, i, l]]
        else:
            segs = seg[t, i, rnd[t, i, l]]
        cols = segs * LANES + lidx[t, i, l]
        k, W = self.rows_per_sublane, self.lane_width
        rows = t * 8 * k + i * k + l // W
        main = COO.from_arrays(rows, cols, vals[t, i, l], self.shape,
                               dtype=vals.dtype)
        if self.side.nnz == 0:
            return main
        return COO.from_arrays(
            np.concatenate([np.asarray(main.row), np.asarray(self.side.row)]),
            np.concatenate([np.asarray(main.col), np.asarray(self.side.col)]),
            np.concatenate([np.asarray(main.data),
                            np.asarray(self.side.data)]),
            self.shape, dtype=vals.dtype,
        )


def supports(mat) -> bool:
    """Whether the Pallas kernel's envelope covers this matrix: x2d must
    fit in VMEM next to the streamed blocks."""
    if not isinstance(mat, (ELL, CSR, COO)):
        return False
    return mat.shape[1] <= 3_000_000 and mat.shape[0] >= 1


def _estimate_rounds(row_ids: np.ndarray, seg_of: np.ndarray, nrow: int,
                     k: int) -> float:
    """Mean distinct-segment count per k-row sublane group (vectorized)."""
    if len(row_ids) == 0:
        return 1.0
    groups = row_ids // k
    ngroups = nrow // k + 1
    pairs = np.unique(groups * (seg_of.max() + 1) + seg_of)
    return len(pairs) / max(ngroups, 1)


def pack_ell(mat, *, rows_per_sublane: int | None = None,
             dtype=None, max_rounds: int | None = None) -> PackedELL:
    """Pack a CSR/ELL/COO matrix for the Pallas kernel (host numpy).

    Picks ``k`` (rows per sublane) to minimize estimated kernel cost
    ``tiles * rounds`` unless given explicitly.  ``max_rounds`` rejects
    scattered patterns early (before the expensive layout work) with a
    ValueError — the planner's cheap escape hatch.
    """
    if hasattr(mat, "tocsr") and not isinstance(mat, (ELL, COO, CSR)):
        # scipy input: stay on the host (device readbacks can be slow on
        # tunneled backends)
        sp_csr = mat.tocsr()
        sp_csr.sort_indices()
        nrow, ncol = sp_csr.shape
        indptr = np.asarray(sp_csr.indptr, dtype=np.int64)
        cols = np.asarray(sp_csr.indices, dtype=np.int64)
        data = np.asarray(sp_csr.data)
        row_ids_np = np.repeat(np.arange(nrow, dtype=np.int64),
                               np.diff(indptr))
        csr = None
        csr_nnz = int(len(data))
    else:
        if isinstance(mat, ELL):
            csr = CSR.from_coo(mat.to_coo())
        elif isinstance(mat, COO):
            csr = CSR.from_coo(mat)
        elif isinstance(mat, CSR):
            csr = mat
        else:
            raise TypeError(
                f"pack_ell expects CSR/ELL/COO/scipy, got {type(mat).__name__}"
            )
        nrow, ncol = csr.shape
        indptr = np.asarray(csr.indptr, dtype=np.int64)
        cols = np.asarray(csr.indices, dtype=np.int64)
        data = np.asarray(csr.data)
        row_ids_np = np.asarray(csr.row_ids, dtype=np.int64)
        csr_nnz = csr.nnz
    if dtype is not None:
        data = data.astype(dtype)
    counts = np.diff(indptr)
    seg_of = cols >> 7

    # --- choose k ---------------------------------------------------------
    if rows_per_sublane is None:
        best, best_cost = 1, float("inf")
        for k in K_CHOICES:
            W = LANES // k
            # overflow fraction if rows are clipped at W
            clipped = np.minimum(counts, W).sum()
            if csr_nnz and clipped < 0.98 * csr_nnz:
                continue            # too much spill for this k
            rounds = max(_estimate_rounds(row_ids_np, seg_of, nrow, k), 1.0)
            tiles = max(-(-nrow // (8 * k)), 1)
            cost = tiles * (rounds + 2.0)
            if cost < best_cost:
                best, best_cost = k, cost
        rows_per_sublane = best
    k = int(rows_per_sublane)
    W = LANES // k
    if max_rounds is not None:
        est = _estimate_rounds(row_ids_np, seg_of, nrow, k)
        if est > max_rounds:
            raise ValueError(
                f"estimated gather rounds {est:.0f} > budget {max_rounds}: "
                f"pattern too scattered for the lane-gather kernel"
            )

    # --- split main/overflow ---------------------------------------------
    offs = np.arange(len(cols)) - indptr[row_ids_np]
    main_mask = offs < W
    side_rows = row_ids_np[~main_mask]
    side = COO.from_arrays(
        side_rows, cols[~main_mask], data[~main_mask], (nrow, ncol),
        dtype=data.dtype,
    )

    m_rows = row_ids_np[main_mask]
    m_cols = cols[main_mask]
    m_data = data[main_mask]
    m_off = offs[main_mask]

    # --- lay out tiles ----------------------------------------------------
    T = max(-(-nrow // (8 * k)), 1)
    lane = (m_rows % k) * W + m_off           # lane within sublane
    sub = (m_rows // k) % 8                   # sublane within tile
    tile = m_rows // (8 * k)                  # tile id

    vals = np.zeros((T, 8, LANES), dtype=m_data.dtype)
    lidx = np.zeros((T, 8, LANES), dtype=np.int8)
    segp = np.full((T, 8, LANES), -1, dtype=np.int64)  # segment per lane
    vals[tile, sub, lane] = m_data
    lidx[tile, sub, lane] = (m_cols & 127).astype(np.int8)
    segp[tile, sub, lane] = m_cols >> 7

    # --- distinct segments → gather rounds (vectorized) -------------------
    def assign_rounds(flat):
        """Per group-row of ``flat [G, L]``: round id of each lane = rank of
        its segment among the row's distinct segments (padding = -1)."""
        order = np.argsort(flat, axis=1, kind="stable")
        sorted_ = np.take_along_axis(flat, order, axis=1)
        valid_sorted = sorted_ >= 0
        is_new = valid_sorted & (sorted_ != np.roll(sorted_, 1, axis=1))
        is_new[:, 0] = valid_sorted[:, 0]
        rid_sorted = np.cumsum(is_new, axis=1) - 1      # -1 on padding run
        M = int(max(rid_sorted.max() + 1, 1))
        rnd_dtype = np.int8 if M <= 127 else np.int16
        rnd = np.zeros_like(flat, dtype=rnd_dtype)
        np.put_along_axis(
            rnd, order, np.maximum(rid_sorted, 0).astype(rnd_dtype), axis=1
        )
        rnd[flat < 0] = 0
        seg_tab = np.zeros((flat.shape[0], M), dtype=np.int32)
        grow, lpos = np.nonzero(is_new)
        seg_tab[grow, rid_sorted[grow, lpos]] = sorted_[grow, lpos].astype(
            np.int32
        )
        return rnd, seg_tab, M

    rnd_sub, seg_sub, M_sub = assign_rounds(segp.reshape(T * 8, LANES))
    rnd_uni, seg_uni, M_uni = assign_rounds(segp.reshape(T, 8 * LANES))
    # uniform rounds do 1 slice+broadcast vs 8 slices: worth it unless the
    # tile-wide distinct-segment count blows up (random patterns)
    tile_uniform = M_uni * 12 <= M_sub * 30
    if tile_uniform:
        M = M_uni
        rnd = rnd_uni.reshape(T, 8, LANES)
        seg = seg_uni                                    # [T, M]
    else:
        M = M_sub
        rnd = rnd_sub.reshape(T, 8, LANES)
        seg = seg_sub.reshape(T, 8, M)                   # [T, 8, M]

    return PackedELL(
        vals=jnp.asarray(vals),
        lidx=jnp.asarray(lidx),
        rnd=jnp.asarray(rnd),
        seg=jnp.asarray(seg),
        side=side,
        shape=(int(nrow), int(ncol)),
        nnz=csr_nnz,
        rounds=int(M),
        rows_per_sublane=k,
        tile_uniform=bool(tile_uniform),
    )


def _kernel(seg_ref, vals_ref, lidx_ref, rnd_ref, x_ref, mask_ref, o_ref,
            prod_ref, *, rounds, tiles_per_step, tile_uniform, k):
    def body(tb, _):
        vals = vals_ref[tb]
        lidx = lidx_ref[tb].astype(jnp.int32)
        rnd = rnd_ref[tb].astype(jnp.int32)
        g = jnp.zeros_like(vals)
        for m in range(rounds):
            if tile_uniform:
                # one slice, replicated to all sublanes (broadcast_to of a
                # dynamic row hangs Mosaic here; an 8-way stack of the same
                # loaded row lowers cleanly)
                row = x_ref[seg_ref[tb, m], :]
                tile = jnp.stack([row] * 8)
            else:
                tile = jnp.stack(
                    [x_ref[seg_ref[tb, i, m], :] for i in range(8)]
                )
            gm = jnp.take_along_axis(tile, lidx, axis=1)
            g = jnp.where(rnd == m, gm.astype(vals.dtype), g)
        # stage the product; the row reduction happens ONCE per grid step
        prod_ref[pl.ds(tb * 8, 8), :] = vals * g
        return 0

    lax.fori_loop(0, tiles_per_step, body, 0)
    # row reduction: one fat [tps*8,128] @ [128,k] block-diagonal mask-dot
    # per STEP (per-tile [8,128] dots cost ~150-200ns each in step
    # overhead — the round-2 GPR reduce showed the same crossover).
    # HIGHEST precision: the MXU's default bf16 passes would truncate
    # f32 products to ~3 digits (observed rel err 4e-3 on chip).
    out = lax.dot_general(
        prod_ref[:], mask_ref[:], (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=o_ref.dtype,
    )
    o_ref[:] = out.reshape(tiles_per_step, 8, k)


@functools.partial(jax.jit, static_argnames=("interpret", "with_side"))
def spmv_pallas(A: PackedELL, x: jax.Array, *, interpret: bool = False,
                with_side: bool = True) -> jax.Array:
    """``A @ x`` via the Pallas lane-gather kernel.

    ``interpret=True`` runs in interpreter mode (CPU testing).
    """
    nrow, ncol = A.shape
    T = A.ntiles
    k = A.rows_per_sublane
    W = A.lane_width
    S = -(-ncol // LANES)
    xpad = jnp.pad(x, (0, S * LANES - ncol)) if S * LANES != ncol else x
    x2d = xpad.reshape(S, LANES).astype(A.vals.dtype)

    # static block-diagonal reduction mask: lane l -> row slot l // W
    lane_ids = np.arange(LANES) // W
    mask = jnp.asarray(
        (lane_ids[:, None] == np.arange(k)[None, :]).astype(np.float32),
        dtype=A.vals.dtype,
    )

    tps = min(TILES_PER_STEP, T)
    nsteps = -(-T // tps)
    Tpad = nsteps * tps
    if Tpad != T:
        zpad = lambda a: jnp.pad(a, ((0, Tpad - T),) + ((0, 0),) * (a.ndim - 1))
        vals, lidx, rnd, seg = map(zpad, (A.vals, A.lidx, A.rnd, A.seg))
    else:
        vals, lidx, rnd, seg = A.vals, A.lidx, A.rnd, A.seg

    seg_spec = (
        pl.BlockSpec((tps, A.rounds), lambda s: (s, 0),
                     memory_space=pltpu.SMEM)
        if A.tile_uniform else
        pl.BlockSpec((tps, 8, A.rounds), lambda s: (s, 0, 0),
                     memory_space=pltpu.SMEM)
    )
    out = pl.pallas_call(
        functools.partial(_kernel, rounds=A.rounds, tiles_per_step=tps,
                          tile_uniform=A.tile_uniform, k=k),
        out_shape=jax.ShapeDtypeStruct((Tpad, 8, k), A.vals.dtype),
        scratch_shapes=[pltpu.VMEM((tps * 8, LANES), A.vals.dtype)],
        grid=(nsteps,),
        in_specs=[
            # per-round segment ids: small per-step block in SMEM (scalar
            # reads steer the dynamic x2d row slices)
            seg_spec,
            pl.BlockSpec((tps, 8, LANES), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tps, 8, LANES), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tps, 8, LANES), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x2d, fully resident
            pl.BlockSpec(memory_space=pltpu.VMEM),   # reduction mask
        ],
        out_specs=pl.BlockSpec((tps, 8, k), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(seg, vals, lidx, rnd, x2d, mask)
    y = out.reshape(-1)[:nrow]
    if with_side and A.side.nnz:
        from ..ops.spmv import spmv_coo

        y = spmv_coo(A.side, x.astype(A.vals.dtype), y=y)
    return y


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmm_pallas(A: PackedELL, X: jax.Array, *, interpret: bool = False
                ) -> jax.Array:
    """``A @ X`` (``X: [ncol, nrhs]``) — per-RHS sweep of the SpMV kernel.

    The packed operands (values, index planes) are shared across the
    right-hand sides; ``lax.map`` compiles the kernel once and iterates.
    XLA's own CSR SpMM is gather-bound (~1 GFLOP/s measured), so even the
    sequential sweep wins by the SpMV kernel's margin.
    """
    if X.ndim != 2:
        raise ValueError(f"X must be [ncol, nrhs], got {X.shape}")
    cols = jax.lax.map(
        lambda col: spmv_pallas(A, col, interpret=interpret), X.T
    )
    return cols.T
