"""Sparse matrix × dense matrix (SpMM, multi-RHS SpMV).

No reference analog — the reference is SpMV-only — but BASELINE.json
config 3 requires CSR SpMM with 32 right-hand sides.  SpMM is where TPUs
shine relative to the reference's ARM cores: the RHS block rides the lane
dimension (128-wide VPU registers, MXU for BSR), so arithmetic intensity
grows with ``nrhs`` while index traffic is amortized.

Convention: ``X`` is ``[ncol, nrhs]``, result is ``[nrow, nrhs]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats import COO, CSR, CSC, ELL, DIA, BSR, BDIA

__all__ = ["spmm", "spmm_coo", "spmm_csr", "spmm_csc", "spmm_ell",
           "spmm_dia", "spmm_bsr", "spmm_bdia"]


def _check_rhs(A, X):
    if X.ndim != 2:
        raise ValueError(f"X must be [ncol, nrhs], got shape {X.shape}")


def spmm_coo(A: COO, X: jax.Array) -> jax.Array:
    _check_rhs(A, X)
    prod = A.data[:, None] * X[A.col]
    return jax.ops.segment_sum(
        prod, A.row, num_segments=A.shape[0], indices_are_sorted=A.rows_sorted
    )


def spmm_csr(A: CSR, X: jax.Array) -> jax.Array:
    _check_rhs(A, X)
    prod = A.data[:, None] * X[A.indices]
    return jax.ops.segment_sum(
        prod, A.row_ids, num_segments=A.shape[0], indices_are_sorted=True
    )


def spmm_csc(A: CSC, X: jax.Array) -> jax.Array:
    _check_rhs(A, X)
    prod = A.data[:, None] * X[A.col_ids]
    return jax.ops.segment_sum(prod, A.indices, num_segments=A.shape[0])


def spmm_ell(A: ELL, X: jax.Array) -> jax.Array:
    _check_rhs(A, X)
    return jnp.einsum("rw,rwk->rk", A.data, X[A.cols],
                      precision=jax.lax.Precision.HIGHEST)


def spmm_dia(A: DIA, X: jax.Array) -> jax.Array:
    _check_rhs(A, X)
    nrow, ncol = A.shape
    min_off, max_off = min(A.offsets), max(A.offsets)
    lo = max(0, -min_off)
    hi = max(0, (nrow - 1) + max_off - (ncol - 1))
    Xp = jnp.pad(X, ((lo, hi), (0, 0)))
    out = jnp.zeros((nrow, X.shape[1]), dtype=jnp.result_type(A.data.dtype, X.dtype))
    for d, off in enumerate(A.offsets):
        sl = jax.lax.dynamic_slice(Xp, (off + lo, 0), (nrow, X.shape[1]))
        out = out + A.data[d][:, None] * sl
    return out


def spmm_bsr(A: BSR, X: jax.Array) -> jax.Array:
    """Per-block ``[bs,bs] @ [bs,nrhs]`` matmuls — true MXU work."""
    _check_rhs(A, X)
    bs = A.block_size
    nrow, ncol = A.shape
    nrhs = X.shape[1]
    ncol_pad = A.nbcol * bs
    Xp = jnp.pad(X, ((0, ncol_pad - ncol), (0, 0))) if ncol_pad != ncol else X
    Xb = Xp.reshape(A.nbcol, bs, nrhs)
    gathered = Xb[A.indices]                      # [nblocks, bs, nrhs]
    Yb = jnp.einsum(
        "nij,njk->nik", A.data, gathered,
        preferred_element_type=jnp.result_type(A.data.dtype, X.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )
    Ybr = jax.ops.segment_sum(
        Yb, A.block_row_ids, num_segments=A.nbrow, indices_are_sorted=True
    )
    return Ybr.reshape(A.nbrow * bs, nrhs)[:nrow]


def spmm_bdia(A: BDIA, X: jax.Array) -> jax.Array:
    """BDIA SpMM — per-block-diagonal ``[nbrow,bs,bs] @ [nbrow,bs,nrhs]``
    batched matmuls over contiguous operands; the highest arithmetic
    intensity of any kernel here (MXU-bound, not bandwidth-bound)."""
    _check_rhs(A, X)
    bs = A.block_size
    nrow, ncol = A.shape
    nrhs = X.shape[1]
    nbrow, nbcol = A.nbrow, A.nbcol
    ncol_pad = nbcol * bs
    Xp = jnp.pad(X, ((0, ncol_pad - ncol), (0, 0))) if ncol_pad != ncol else X
    Xb = Xp.reshape(nbcol, bs, nrhs)
    min_off, max_off = min(A.offsets), max(A.offsets)
    lo = max(0, -min_off)
    hi = max(0, (nbrow - 1) + max_off - (nbcol - 1))
    Xbp = jnp.pad(Xb, ((lo, hi), (0, 0), (0, 0)))
    out_dtype = jnp.result_type(A.data.dtype, X.dtype)
    acc = jnp.zeros((nbrow, bs, nrhs), dtype=out_dtype)
    for d, off in enumerate(A.offsets):
        Xs = jax.lax.dynamic_slice(Xbp, (off + lo, 0, 0), (nbrow, bs, nrhs))
        acc = acc + jnp.einsum(
            "nij,njk->nik", A.data[d], Xs, preferred_element_type=out_dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
    return acc.reshape(nbrow * bs, nrhs)[:nrow]


_DISPATCH = {
    COO: spmm_coo,
    CSR: spmm_csr,
    CSC: spmm_csc,
    ELL: spmm_ell,
    DIA: spmm_dia,
    BSR: spmm_bsr,
    BDIA: spmm_bdia,
}


def spmm(A, X: jax.Array) -> jax.Array:
    """``A @ X`` for any supported sparse format, ``X: [ncol, nrhs]``."""
    try:
        fn = _DISPATCH[type(A)]
    except KeyError:
        raise TypeError(f"unsupported sparse type {type(A).__name__}") from None
    return fn(A, X)
