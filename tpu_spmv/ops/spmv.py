"""Sparse matrix–vector products, one XLA-level kernel per format.

Reference parity: the five serial/OpenMP SpMV kernels of
`/root/reference/src/mat_vec.cpp:18-146` (COO gather-scatter, CSR row dots,
CSC column scatter, ELL slot loop, DIA bounded diagonal loop).  The TPU
formulations eliminate every scatter/atomic:

- COO/CSR/CSC → gather ``x`` + ``jax.ops.segment_sum`` (deterministic
  segmented reduction; the reference needs ``#pragma omp atomic`` at
  `/root/reference/src/mat_vec.cpp:37,89`).
- ELL → dense gather + row reduction (pure VPU, XLA fuses to one pass).
- DIA → static per-diagonal shifted FMAs on a padded ``x`` (unit-stride,
  gather-free).
- BSR → block gather + ``einsum`` contraction (MXU-eligible).

Semantics: ``spmv(A, x)`` returns ``A @ x``.  The reference's kernels
*accumulate* (``y += Ax``, SURVEY.md Q2); pass ``y=`` to get that:
``spmv(A, x, y=y)`` computes ``y + A@x`` functionally.

Hand-tiled Pallas fast paths live in ``tpu_spmv.kernels``; the dispatcher in
``tpu_spmv.ops`` picks between them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..formats import COO, CSR, CSC, ELL, DIA, BSR, BDIA

__all__ = ["spmv", "spmv_coo", "spmv_csr", "spmv_csc", "spmv_ell",
           "spmv_dia", "spmv_bsr", "spmv_bdia"]


def _finish(ax: jax.Array, y: jax.Array | None) -> jax.Array:
    return ax if y is None else y + ax


def spmv_coo(A: COO, x: jax.Array, y: jax.Array | None = None) -> jax.Array:
    """COO SpMV (reference: `/root/reference/src/mat_vec.cpp:18-41`)."""
    prod = A.data * x[A.col]
    ax = jax.ops.segment_sum(
        prod, A.row, num_segments=A.shape[0], indices_are_sorted=A.rows_sorted
    )
    return _finish(ax, y)


def spmv_csr(A: CSR, x: jax.Array, y: jax.Array | None = None) -> jax.Array:
    """CSR SpMV (reference: `/root/reference/src/mat_vec.cpp:44-66`).

    Row dot-products become a sorted segment-sum over the expanded row ids.
    """
    prod = A.data * x[A.indices]
    ax = jax.ops.segment_sum(
        prod, A.row_ids, num_segments=A.shape[0], indices_are_sorted=True
    )
    return _finish(ax, y)


def spmv_csc(A: CSC, x: jax.Array, y: jax.Array | None = None) -> jax.Array:
    """CSC SpMV (reference: `/root/reference/src/mat_vec.cpp:69-94`).

    The reference's atomic row scatter becomes an (unsorted) segment-sum over
    row indices — this also supplies the cross-partition y-reduction the
    reference's NUMA CSC path forgot (SURVEY.md Q5).
    """
    prod = A.data * x[A.col_ids]
    ax = jax.ops.segment_sum(prod, A.indices, num_segments=A.shape[0])
    return _finish(ax, y)


def spmv_ell(A: ELL, x: jax.Array, y: jax.Array | None = None) -> jax.Array:
    """ELL SpMV (reference: `/root/reference/src/mat_vec.cpp:97-119`).

    Padding slots store value 0, so no mask is needed in the product."""
    ax = jnp.einsum("rw,rw->r", A.data, x[A.cols])
    return _finish(ax, y)


def spmv_dia(A: DIA, x: jax.Array, y: jax.Array | None = None) -> jax.Array:
    """DIA SpMV (reference: `/root/reference/src/mat_vec.cpp:123-146`).

    The reference bounds-tests every element; here out-of-range slots are
    structural zeros in ``A.data``, so each diagonal is one unit-stride FMA
    over a statically-sliced padded x.
    """
    nrow, ncol = A.shape
    min_off = min(A.offsets)
    max_off = max(A.offsets)
    lo = max(0, -min_off)
    hi = max(0, (nrow - 1) + max_off - (ncol - 1))
    xp = jnp.pad(x, (lo, hi))
    ax = jnp.zeros(nrow, dtype=jnp.result_type(A.data.dtype, x.dtype))
    for d, off in enumerate(A.offsets):
        ax = ax + A.data[d] * jax.lax.dynamic_slice(xp, (off + lo,), (nrow,))
    return _finish(ax, y)


def spmv_bsr(A: BSR, x: jax.Array, y: jax.Array | None = None) -> jax.Array:
    """BSR SpMV — block gather + per-block MXU contraction.

    The reference's block format is an empty stub
    (`/root/reference/src/matrix.cpp:619-632`); this is the real kernel
    BASELINE.json config 4 asks for.
    """
    bs = A.block_size
    nrow, ncol = A.shape
    ncol_pad = A.nbcol * bs
    xp = jnp.pad(x, (0, ncol_pad - ncol)) if ncol_pad != ncol else x
    xb = xp.reshape(A.nbcol, bs)
    gathered = xb[A.indices]                      # [nblocks, bs]
    yb = jnp.einsum(
        "nij,nj->ni", A.data, gathered,
        preferred_element_type=jnp.result_type(A.data.dtype, x.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )
    ybr = jax.ops.segment_sum(
        yb, A.block_row_ids, num_segments=A.nbrow, indices_are_sorted=True
    )
    ax = ybr.reshape(-1)[:nrow]
    return _finish(ax, y)


def spmv_bdia(A: BDIA, x: jax.Array, y: jax.Array | None = None) -> jax.Array:
    """BDIA SpMV — per-block-diagonal dense contractions, gather-free.

    The block analog of :func:`spmv_dia`: each block-diagonal contributes
    ``einsum('nij,nj->ni', blocks_d, x_blocks shifted by d)`` over purely
    contiguous operands.  This is the intended kernel for structured-PDE
    block matrices (BASELINE config 4): MXU-shaped work with DIA's memory
    behavior.
    """
    bs = A.block_size
    nrow, ncol = A.shape
    nbrow, nbcol = A.nbrow, A.nbcol
    ncol_pad = nbcol * bs
    xp = jnp.pad(x, (0, ncol_pad - ncol)) if ncol_pad != ncol else x
    xb = xp.reshape(nbcol, bs)
    min_off, max_off = min(A.offsets), max(A.offsets)
    lo = max(0, -min_off)
    hi = max(0, (nbrow - 1) + max_off - (nbcol - 1))
    xbp = jnp.pad(xb, ((lo, hi), (0, 0)))
    out_dtype = jnp.result_type(A.data.dtype, x.dtype)
    acc = jnp.zeros((nbrow, bs), dtype=out_dtype)
    for d, off in enumerate(A.offsets):
        xs = jax.lax.dynamic_slice(xbp, (off + lo, 0), (nbrow, bs))
        acc = acc + jnp.einsum(
            "nij,nj->ni", A.data[d], xs, preferred_element_type=out_dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
    ax = acc.reshape(-1)[:nrow]
    return _finish(ax, y)


_DISPATCH = {
    COO: spmv_coo,
    CSR: spmv_csr,
    CSC: spmv_csc,
    ELL: spmv_ell,
    DIA: spmv_dia,
    BSR: spmv_bsr,
    BDIA: spmv_bdia,
}


def spmv(A, x: jax.Array, y: jax.Array | None = None) -> jax.Array:
    """``A @ x`` (or ``y + A @ x``) for any supported sparse format."""
    try:
        fn = _DISPATCH[type(A)]
    except KeyError:
        raise TypeError(f"unsupported sparse type {type(A).__name__}") from None
    return fn(A, x, y)
