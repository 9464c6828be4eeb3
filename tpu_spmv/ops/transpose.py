"""Transpose across formats — zero-copy where the layout allows.

The reference has no transpose operation at all; ``A^T x`` is what least-
squares solvers (:mod:`tpu_spmv.solvers.lsqr`) and reverse-mode autodiff
need, so it is first-class here.  The TPU-relevant observation: CSR and
CSC are the SAME memory layout read with the roles of rows and columns
swapped, so those transposes move no data at all (the entries of ``A``
sorted by (row, col) ARE the entries of ``A^T`` sorted by (col, row)):

- ``CSR^T -> CSC`` / ``CSC^T -> CSR``: reuse all four arrays verbatim;
- ``COO^T``: swap the row/col leaves (entry order becomes column-major,
  i.e. unsorted for the new row space — conversions re-sort lazily);
- ``DIA^T``: negate the offsets and shift each diagonal in place
  (``dataT[d', i] = data[d, i + o']``, zero fill at the edges);
- streaming packs: :func:`~tpu_spmv.kernels.dia_stream.transpose_sdia` /
  ``transpose_psdia`` (padded row space, same kernels).

ELL/BSR/BDIA transposes need a host re-pack (their layouts bake in the
row grouping); convert through COO explicitly for those.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats import COO, CSR, CSC, DIA

__all__ = ["transpose"]


def _shift_rows(data: jax.Array, offsets, width: int) -> jax.Array:
    """Per-diagonal zero-filled shifts: row ``d`` of the result holds
    ``data[d, i + offsets[d]]`` over ``i in [0, width)``."""
    src_w = int(data.shape[1])
    rows = []
    for d, off in enumerate(offsets):
        off = int(off)
        lo = max(0, -off)                  # first valid dest slot
        hi = min(width, src_w - off)       # one past last valid dest slot
        if hi <= lo:
            rows.append(jnp.zeros((width,), data.dtype))
            continue
        seg = jax.lax.slice_in_dim(data[d], lo + off, hi + off)
        rows.append(jnp.pad(seg, (lo, width - hi)))
    return jnp.stack(rows)


def transpose(A):
    """``A^T`` in the natural target format (see module docstring)."""
    if isinstance(A, CSR):
        return CSC(data=A.data, indices=A.indices, indptr=A.indptr,
                   col_ids=A.row_ids, shape=(A.shape[1], A.shape[0]))
    if isinstance(A, CSC):
        return CSR(data=A.data, indices=A.indices, indptr=A.indptr,
                   row_ids=A.col_ids, shape=(A.shape[1], A.shape[0]))
    if isinstance(A, COO):
        return COO(row=A.col, col=A.row, data=A.data,
                   shape=(A.shape[1], A.shape[0]), rows_sorted=False)
    if isinstance(A, DIA):
        # A^T[i, i + o'] = A[i + o', i] = data[d, i + o'] with o' = -o
        offs_T = [-int(o) for o in A.offsets]
        order = sorted(range(len(offs_T)), key=lambda d: offs_T[d])
        # dataT[d', i] = data[d, i + o'] where o' = -offsets[d]
        data_T = _shift_rows(
            jnp.stack([A.data[d] for d in order]),
            [offs_T[d] for d in order], A.shape[1])
        return DIA(data=data_T,
                   offsets=tuple(offs_T[d] for d in order),
                   shape=(A.shape[1], A.shape[0]), nnz=A.nnz)
    # streaming packs keep their transpose next to their kernels
    from ..kernels import dia_stream

    if isinstance(A, dia_stream.SDIA):
        return dia_stream.transpose_sdia(A)
    if isinstance(A, dia_stream.PSDIA):
        return dia_stream.transpose_psdia(A)
    raise TypeError(
        f"no in-place transpose for {type(A).__name__}; convert through "
        f"COO (convert(transpose(to_coo(A)), ...)) — its layout bakes in "
        f"the row grouping")
