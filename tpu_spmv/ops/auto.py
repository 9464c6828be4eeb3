"""SpMV strategy planner — the framework's analysis/autotune phase.

The reference benchmarks every format and leaves the choice to the reader
(`/root/reference/main.cpp:54-123`).  A production library does the choosing
itself (cf. cuSPARSE's analysis step): :func:`plan_spmv` inspects the
sparsity pattern **on the host, once** and returns the execution format best
matched to TPU hardware:

- few occupied diagonals → **DIA** (pure shifted FMAs, gather-free — the
  fastest thing a TPU can do with a sparse matrix);
- dense blocks → **BSR** (contiguous block DMA + MXU contraction);
- bounded row width → **ELL** (dense 2-D gather, one reduction);
- otherwise → **CSR** segment-sum.

The returned plan is a converted matrix + the matching kernel; calling it is
just ``plan(x)``.  Pattern analysis cost is amortized across every
subsequent SpMV (the reference re-converts per benchmark run too).

Preference order (from measured TPU costs, docs/DESIGN.md):
DIA > BDIA (both gather-free, run at HBM speed of light) > Pallas
packed-ELL (lane-gather, 20-100x XLA, bounded gather rounds) > BSR / ELL /
CSR XLA fallbacks.  All planning and packing stays on host numpy — device
round-trips during setup are expensive on tunneled backends.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

from ..formats import COO, CSR, CSC, ELL, DIA, BSR, convert, to_coo
from .spmv import spmv

__all__ = ["SpmvPlan", "analyze", "plan_spmv", "plan_from_matrix",
           "pallas_ell_cost_s", "gpr_cost_s"]


#: streaming-DIA switchover: data working set beyond clear VMEM residency
_STREAM_MIN_BYTES = 32 * 1024 * 1024
#: test hook: exercise the streaming planner arms on the CPU backend
_stream_on_cpu = False


def pallas_ell_cost_s(ntiles: int, rounds: int) -> float:
    """Measured per-SpMV cost model of the Pallas packed-ELL kernel:
    ~12ns per tile-round plus ~30us fixed (round-2 re-calibration,
    tools/profile_psell.py, after the per-step fat mask-dot restructure;
    the pre-restructure model was 80ns/tile-round)."""
    return ntiles * rounds * 12e-9 + 30e-6


def gpr_cost_s(nnz: int) -> float:
    """Measured per-SpMV cost model of the GPR pipeline: ~0.13ns per
    entry (fused gather+stage1, fused stage23+mask-dot reduce, engine v3
    on small-chunk fuller-tile packs — round 4: ~99us at 700k uniform,
    ~840us at 5M power-law) plus a ~30us fixed cost (launches + class
    combine + y reorder)."""
    return nnz * 0.13e-9 + 30e-6


@dataclasses.dataclass(frozen=True)
class PatternStats:
    """Host-side sparsity-pattern statistics."""

    nrow: int
    ncol: int
    nnz: int
    ndiags: int                 # occupied scalar diagonals
    nblockdiags_8: int          # occupied 8x8 block diagonals
    max_row_nnz: int
    avg_row_nnz: float
    block_fill_8: float         # nnz / (8*8 * occupied 8x8 blocks)
    ell_fill: float             # nnz / (nrow * max_row_nnz)


def _host_coo(mat, dtype=None):
    """A COO whose leaves are host numpy — planning must not round-trip
    the device (readbacks are slow on tunneled backends).  Valid input to
    every conversion (they np.asarray their inputs).

    Device-format inputs are pulled to host ONCE here (with a warning) so
    analyze/convert/pack never re-read device leaves; prefer passing the
    scipy/host matrix to :func:`plan_spmv` directly."""
    from ..formats.coo import COO

    if hasattr(mat, "tocoo") and not isinstance(mat, COO):
        m = mat.tocoo()
        data = m.data if dtype is None else m.data.astype(dtype)
        return COO(row=m.row.astype(np.int64), col=m.col.astype(np.int64),
                   data=data, shape=m.shape, rows_sorted=False)
    coo = to_coo(mat)
    import jax

    if any(isinstance(l, jax.Array) for l in (coo.row, coo.col, coo.data)):
        import warnings

        warnings.warn(
            "plan_spmv received a device-resident matrix; pulling it to "
            "host once for planning (pass the scipy/host matrix to avoid "
            "the transfer)", stacklevel=3)
        coo = COO(row=np.asarray(coo.row), col=np.asarray(coo.col),
                  data=np.asarray(coo.data), shape=coo.shape,
                  rows_sorted=coo.rows_sorted)
    return coo if dtype is None else coo.astype(dtype)


def analyze(mat) -> PatternStats:
    coo = _host_coo(mat)
    row = np.asarray(coo.row, dtype=np.int64)
    col = np.asarray(coo.col, dtype=np.int64)
    nrow, ncol = coo.shape
    nnz = int(np.asarray(coo.data).shape[0])
    if nnz == 0:
        return PatternStats(nrow, ncol, 0, 0, 0, 0, 0.0, 0.0, 0.0)
    # diagonal counts via bincount over the (nrow+ncol)-sized offset
    # range — sort-free (np.unique sorts all nnz; 2-3x slower at 5M)
    ndiags = int((np.bincount(col - row + nrow - 1,
                              minlength=nrow + ncol - 1) > 0).sum())
    counts = np.bincount(row, minlength=nrow)
    max_row = int(counts.max())
    nbcol = -(-ncol // 8)
    brow, bcol = row // 8, col // 8
    blocks = len(np.unique(brow * nbcol + bcol))
    nblockdiags = int((np.bincount(bcol - brow + (-(-nrow // 8)) - 1,
                                   minlength=(-(-nrow // 8)) + nbcol - 1)
                       > 0).sum())
    return PatternStats(
        nrow=nrow, ncol=ncol, nnz=nnz, ndiags=ndiags,
        nblockdiags_8=nblockdiags,
        max_row_nnz=max_row, avg_row_nnz=nnz / max(nrow, 1),
        block_fill_8=nnz / (64.0 * max(blocks, 1)),
        ell_fill=nnz / (float(nrow) * max(max_row, 1)),
    )


@dataclasses.dataclass(frozen=True)
class SpmvPlan:
    """A chosen execution strategy: converted matrix + kernel."""

    matrix: object              # the converted format instance
    strategy: str               # "dia" | "bdia" | "pallas_ell" | "bsr" | ...
    stats: PatternStats | None = None
    _kernel: Callable = spmv

    def __call__(self, x, y=None):
        return self._kernel(self.matrix, x, y)

    def transpose(self) -> "SpmvPlan":
        """The plan for ``A^T`` — zero-copy / device-side for the
        strategies whose layout supports it (see :mod:`..ops.transpose`);
        packed Pallas strategies (gpr / pallas_ell) raise — re-plan from
        the host matrix for those (``plan_spmv(mat.T)``)."""
        from .transpose import transpose as _t

        swaps = {"csr": "csc", "csc": "csr", "coo": "coo", "dia": "dia",
                 "dia_stream": "dia_stream", "pdia_stream": "pdia_stream"}
        if self.strategy not in swaps:
            raise TypeError(
                f"strategy {self.strategy!r} has no in-place transpose; "
                f"re-plan from the host matrix: plan_spmv(mat.T)")
        return plan_from_matrix(_t(self.matrix), swaps[self.strategy],
                                self.stats)

    def matvec_differentiable(self, plan_T: "SpmvPlan | None" = None):
        """A matvec closure differentiable in ``x`` (matrix held fixed).

        Packed Pallas pipelines (gpr / pallas_ell) are not traceable by
        JAX autodiff; the chain rule only needs ``x_bar = A^T g``, so the
        closure carries a custom VJP that runs the TRANSPOSE plan's
        forward kernel — the same trick the streaming-DIA kernels use
        (`kernels/dia_stream.py:_spmv_sdia_bwd`), lifted to plan level so
        EVERY strategy becomes differentiable:

        - strategies with an in-place transpose (csr/csc/coo/dia/
          dia_stream/pdia_stream) get ``plan_T`` automatically;
        - packed strategies pass one explicitly — ``plan_spmv(mat.T)``
          packs once at build time (for symmetric matrices pass the plan
          itself);
        - matrix-value gradients are NOT provided here (use the
          streaming-DIA pattern/data VJPs for fitted-stencil learning).
        """
        import jax

        if plan_T is None:
            plan_T = self.transpose()
        fwd_plan = self

        @jax.custom_vjp
        def mv(x):
            return fwd_plan(x)

        def fwd(x):
            return mv(x), None

        def bwd(_, g):
            return (plan_T(g),)

        mv.defvjp(fwd, bwd)
        return mv

    def solver_space(self):
        """``(encode, matvec, decode)`` for running WHOLE solver loops in
        the kernel's native vector space.

        The streaming strategies (dia_stream / pdia_stream) compute in a
        padded row space; calling the plan per iteration pays a pad +
        unpad pass (2 x 134 MB at the 16.7M-row bench scale) every SpMV.
        Solvers that iterate — cg, chebyshev, power iteration — should
        ``encode`` once, loop on ``matvec`` (shape-preserving, pads stay
        exactly zero: PSDIA's row mask / SDIA's structural-zero pad
        tiles), and ``decode`` the result.  Dots and norms over padded
        vectors are exact because the pads are zero.  For every other
        strategy all three are identity/self.
        """
        import jax

        if self.strategy in ("dia_stream", "pdia_stream"):
            from ..kernels import dia_stream

            A = self.matrix
            periodic = self.strategy == "pdia_stream"
            kern = (dia_stream.spmv_psdia_padded if periodic
                    else dia_stream.spmv_sdia_padded)

            def matvec(v):
                interp = jax.devices()[0].platform == "cpu"
                return kern(A, v, interpret=interp)

            return (lambda v: dia_stream.pad_x(A, v), matvec,
                    lambda v: dia_stream.unpad_y(A, v))
        return (lambda v: v), self, (lambda v: v)

    def spmm(self, X):
        """Multi-RHS product with the strategy's SpMM kernel (falls back
        to the XLA per-format SpMM for strategies without a native one)."""
        import jax

        interp = jax.devices()[0].platform == "cpu"
        if self.strategy == "dia_stream":
            from ..kernels import dia_stream

            return dia_stream.spmm_sdia(self.matrix, X, interpret=interp)
        if self.strategy == "pdia_stream":
            from ..kernels import dia_stream

            return dia_stream.spmm_psdia(self.matrix, X, interpret=interp)
        if self.strategy == "gpr":
            from ..kernels import gpr as _gpr

            fn = (_gpr.spmm_gpr_chunked
                  if isinstance(self.matrix, _gpr.GPCSRChunked)
                  else _gpr.spmm_gpr)
            return fn(self.matrix, X, interpret=interp)
        if self.strategy == "pallas_ell":
            from ..kernels import ell_pallas

            return ell_pallas.spmm_pallas(self.matrix, X, interpret=interp)
        from .spmm import spmm as _spmm

        return _spmm(self.matrix, X)


def _kernel_for_strategy(strategy: str) -> Callable:
    """The SpMV callable matching a strategy name (shared by
    :func:`plan_spmv` and cache reload via :func:`plan_from_matrix`)."""
    import jax

    if strategy == "pallas_ell":
        from ..kernels import ell_pallas

        def pallas_kernel(A, x, y=None):
            interp = jax.devices()[0].platform == "cpu"
            out = ell_pallas.spmv_pallas(A, x, interpret=interp)
            return out if y is None else y + out

        return pallas_kernel
    if strategy == "dia_stream":
        from ..kernels import dia_stream

        def sdia_kernel(A, x, y=None):
            interp = jax.devices()[0].platform == "cpu"
            return dia_stream.spmv_sdia(A, x, y, interpret=interp)

        return sdia_kernel
    if strategy == "pdia_stream":
        from ..kernels import dia_stream

        def psdia_kernel(A, x, y=None):
            interp = jax.devices()[0].platform == "cpu"
            return dia_stream.spmv_psdia(A, x, y, interpret=interp)

        return psdia_kernel
    if strategy == "gpr":
        from ..kernels import gpr as _gpr

        def gpr_kernel(A, x, y=None):
            interp = jax.devices()[0].platform == "cpu"
            fn = (_gpr.spmv_gpr_chunked
                  if isinstance(A, _gpr.GPCSRChunked) else _gpr.spmv_gpr)
            out = fn(A, x, interpret=interp)
            return out if y is None else y + out

        return gpr_kernel
    return spmv


def plan_from_matrix(matrix, strategy: str,
                     stats: PatternStats | None = None) -> SpmvPlan:
    """Rebuild an executable plan from an already-converted/packed matrix
    (e.g. one reloaded via :mod:`tpu_spmv.io.checkpoint`) — skips analysis
    and packing entirely, which is the point of the ``--cache`` CLI flag."""
    return SpmvPlan(matrix, strategy, stats, _kernel_for_strategy(strategy))


def plan_spmv(mat, *, use_pallas: bool | None = None,
              dtype=None) -> SpmvPlan:
    """Analyze ``mat`` and return the best-strategy plan.

    Heuristics (thresholds chosen from measured TPU costs: shifts >> block
    DMA >> 2-D gather >> scatter/segment paths):

    - DIA when the DIA storage (ndiags*nrow) does not exceed ~4x nnz
      (storage ratio only — few diagonals with sparse fill would still
      inflate HBM traffic);
    - BSR when 8x8 blocks are at least quarter-full;
    - ELL when padding waste is bounded (fill >= 25%);
    - CSR otherwise.
    """
    stats = analyze(mat)
    kernel = spmv
    if stats.nnz == 0:
        return SpmvPlan(convert(_host_coo(mat, dtype), "csr"), "csr", stats, kernel)
    dia_storage = stats.ndiags * stats.nrow
    bdia_storage = stats.nblockdiags_8 * (-(-stats.nrow // 8)) * 64
    # storage ratio is the ONLY criterion: DIA runs at stream speed, so the
    # 4x byte inflation cap bounds the slowdown vs a perfect format at 4x;
    # a bare ndiags<=64 arm would admit 64-diag matrices at 5 nnz/row
    # (12.8x the bytes) — strictly slower on an HBM-bound kernel
    if dia_storage <= 4 * stats.nnz and dia_storage <= bdia_storage:
        from ..formats.dia import DIA as _DIA

        hc = _host_coo(mat, dtype)
        hdata, hoffs = _DIA.host_arrays(hc)
        # host-leaf DIA: valid input to detection and to the stream packs
        # (only the pattern / padded data crosses the host->device tunnel)
        hdia = _DIA(data=hdata, offsets=hoffs, shape=hc.shape,
                    nnz=stats.nnz)
        # beyond VMEM residency, XLA's lowering of the shifted FMAs drops
        # to ~14% of the HBM roofline; the streaming Pallas kernels hold
        # 79%+ (measured, kernels/dia_stream.py) — switch over when the
        # working set clearly exceeds VMEM
        import jax as _jax

        if ((_jax.devices()[0].platform != "cpu" or _stream_on_cpu)
                and dia_storage * np.dtype(dtype or np.float32).itemsize
                > _STREAM_MIN_BYTES):
            from ..kernels import dia_stream

            # periodic diagonals (grid stencils / Toeplitz): coefficients
            # stay VMEM-resident — the whole data stream disappears from
            # the per-SpMV HBM traffic (verified exactly at pack time)
            period = dia_stream.detect_period(hdia)
            if period is not None:
                try:
                    # detect_period already proved periodicity on this
                    # same host data; re-verifying materializes [nd, nrow]
                    # temporaries on a ~6 MB/s demand-paging host
                    return SpmvPlan(
                        dia_stream.pack_psdia(hdia, period=period,
                                              verify=False),
                        "pdia_stream", stats,
                        _kernel_for_strategy("pdia_stream"))
                except ValueError:
                    pass
            if dia_stream.supports_sdia(
                    hoffs, hc.shape,
                    itemsize=int(np.dtype(hdata.dtype).itemsize)):
                return SpmvPlan(dia_stream.pack_sdia(hdia), "dia_stream",
                                stats, _kernel_for_strategy("dia_stream"))
        import jax.numpy as jnp

        dia = _DIA(data=jnp.asarray(hdata), offsets=hoffs, shape=hc.shape,
                   nnz=stats.nnz)
        return SpmvPlan(dia, "dia", stats, kernel)
    if bdia_storage <= 4 * stats.nnz:
        # block-banded (structured PDE): gather-free block-diagonal einsum
        return SpmvPlan(convert(_host_coo(mat, dtype), "bdia", block_size=8), "bdia", stats,
                        kernel)
    # no gather-free formulation: the Pallas lane-gather kernel beats every
    # XLA gather/scatter path by 20-100x on TPU (see docs/DESIGN.md); use
    # it whenever its envelope covers the matrix
    import jax

    if use_pallas is None:
        use_pallas = jax.devices()[0].platform != "cpu"
    # effective compute dtype: an explicit dtype wins; otherwise the
    # matrix's own data dtype carries through the packs (review r5: the
    # guard below used to fire only on explicit dtype=np.float64,
    # letting a dtype=None f64 matrix reach Mosaic — or be silently
    # downcast by the GPR branch's `dtype or np.float32`)
    if dtype is not None:
        eff_dtype = np.dtype(dtype)
    else:
        data = getattr(mat, "data", None)
        eff_dtype = (np.dtype(data.dtype) if data is not None
                     else np.dtype(np.float32))
    if (use_pallas and eff_dtype.itemsize >= 8
            and jax.devices()[0].platform != "cpu"):
        # Mosaic has no f64 lowering: on chip, double-precision runs ride
        # the (software-emulated) XLA tier; CPU oracles keep the Pallas
        # interpret path (full f64 accumulation) — docs/DESIGN.md f64
        # support table
        use_pallas = False
    if use_pallas:
        from ..kernels import ell_pallas

        # envelope: x2d must fit in VMEM (checked on shape alone — no
        # device-array conversion during planning)
        if mat.shape[1] <= 3_000_000 and mat.shape[0] >= 1:
            source = _host_coo(mat, dtype)
            if stats.max_row_nnz > 128:
                # hub rows: PSELL would clip them onto its COO side path
                # (the catastrophic scatter route) AND its layout probe is
                # expensive at k=1 — GPR splits hubs into virtual rows
                # instead.  Skip the probe entirely (measured: the probe
                # alone cost 238s on a 200k-row power-law matrix).
                packed = None
            else:
                try:
                    # the kernel unrolls its gather rounds: a large M
                    # (scattered columns, e.g. big uniform-random
                    # patterns) blows up both compile and run time —
                    # max_rounds rejects those early
                    packed = ell_pallas.pack_ell(source, max_rounds=48,
                                                 dtype=dtype)
                except ValueError:
                    packed = None
            from ..kernels import gpr as _gpr

            pallas_est = (pallas_ell_cost_s(packed.ntiles, packed.rounds)
                          if packed is not None else float("inf"))
            # GPR envelope: ncol within the (blocked) gather reach; nnz
            # unlimited via row-chunked packs (each chunk single-level →
            # the fused two-launch pipeline; chunks add one fixed cost
            # each).  Chunk below the ~900k single-level routing cap so
            # no chunk falls to the slower two-level/non-fused path.
            ncol_ok = mat.shape[1] <= _gpr.CB_SEGS * _gpr.LANES * 10
            nchunks = max(1, -(-stats.nnz // _gpr.CHUNK_NNZ))
            gpr_est = ((gpr_cost_s(stats.nnz) + 35e-6 * (nchunks - 1))
                       if ncol_ok else float("inf"))
            if packed is not None and pallas_est <= gpr_est:
                return SpmvPlan(packed, "pallas_ell", stats,
                                _kernel_for_strategy("pallas_ell"))
            # scattered pattern: the gather-permute-reduce pipeline handles
            # arbitrary patterns at ~77x the XLA fallback (docs/DESIGN.md)
            if gpr_est < float("inf"):
                host = (mat if hasattr(mat, "tocsr")
                        else _host_coo(mat, dtype))
                if nchunks > 1:
                    if not hasattr(host, "tocsr"):
                        import scipy.sparse as sp

                        host = sp.csr_matrix(
                            (np.asarray(host.data),
                             (np.asarray(host.row), np.asarray(host.col))),
                            shape=host.shape)
                    gp = _gpr.pack_gpr_chunked(host, dtype=eff_dtype,
                                               chunk_nnz=_gpr.CHUNK_NNZ)
                else:
                    gp = _gpr.pack_gpr(host, dtype=eff_dtype)
                return SpmvPlan(gp, "gpr", stats,
                                _kernel_for_strategy("gpr"))
    if stats.block_fill_8 >= 0.25:
        return SpmvPlan(convert(_host_coo(mat, dtype), "bsr", block_size=8), "bsr", stats, kernel)
    if stats.ell_fill >= 0.25:
        return SpmvPlan(convert(_host_coo(mat, dtype), "ell"), "ell", stats, kernel)
    return SpmvPlan(convert(_host_coo(mat, dtype), "csr"), "csr", stats, kernel)
