"""CSR (compressed sparse row) format.

Reference parity: ``CSRMatrix`` (`/root/reference/include/matrix.h:27-47`,
conversion `/root/reference/src/matrix.cpp:115-154`).  The reference builds
CSR from COO with a serial counting sort (histogram, prefix sum, reverse
scatter — `/root/reference/src/matrix.cpp:125-144`); here the same shape is
expressed as vectorized ``bincount``/``cumsum`` on the host, and the result is
a pytree of device arrays.

Beyond the reference we also carry ``row_ids`` (``[nnz]`` row index of every
entry, the "expanded indptr").  This is the form TPU segmented reductions
want: CSR SpMV on XLA is ``segment_sum(data * x[indices], row_ids)`` with
``indices_are_sorted=True`` — no per-row serial loop, no atomics.

The per-row ``diagonal`` extraction of the reference
(`/root/reference/src/matrix.cpp:146-153`) is provided as
:meth:`CSR.diagonal`, fixed to be row-aligned (the reference appends
"k-th diagonal encountered", which misaligns when rows lack diagonal
entries — SURVEY.md Q7).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import (
    as_index_array,
    as_value_array,
    sparse_dataclass,
    static_field,
)
from .coo import COO

__all__ = ["CSR"]


@sparse_dataclass
class CSR:
    """Compressed-sparse-row matrix.

    Attributes:
      data: ``[nnz]`` values, row-major (sorted by row, then column).
      indices: ``[nnz] int32`` column index per entry.
      indptr: ``[nrow+1] int32`` row pointer.
      row_ids: ``[nnz] int32`` row index per entry (expanded indptr) — the
        segment ids used by TPU segment reductions.
      shape: static ``(nrow, ncol)``.
    """

    data: jax.Array
    indices: jax.Array
    indptr: jax.Array
    row_ids: jax.Array
    shape: tuple[int, int] = static_field()

    # -- construction ------------------------------------------------------

    @staticmethod
    def from_coo(coo: COO) -> "CSR":
        """COO → CSR: the reference's counting sort, vectorized.

        Mirrors ``CSRMatrix(const COOMatrix&)``
        (`/root/reference/src/matrix.cpp:115-144`) but via lexsort +
        bincount + cumsum; handles unsorted input and is stable.
        """
        row = np.asarray(coo.row)
        col = np.asarray(coo.col)
        data = np.asarray(coo.data)
        nrow, ncol = coo.shape
        if not coo.rows_sorted:
            order = np.lexsort((col, row))
            row, col, data = row[order], col[order], data[order]
        counts = np.bincount(row, minlength=nrow)
        indptr = np.zeros(nrow + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        return CSR(
            data=jnp.asarray(data, dtype=coo.data.dtype),
            indices=as_index_array(col),
            indptr=as_index_array(indptr),
            row_ids=as_index_array(row),
            shape=(int(nrow), int(ncol)),
        )

    @staticmethod
    def from_arrays(data, indices, indptr, shape, *, dtype=None) -> "CSR":
        """Build from preexisting CSR triplet (e.g. scipy)."""
        indptr_np = np.asarray(indptr, dtype=np.int64)
        nrow, ncol = shape
        if indptr_np.shape != (nrow + 1,):
            raise ValueError(f"indptr must have shape ({nrow + 1},)")
        row_ids = np.repeat(
            np.arange(nrow, dtype=np.int64), np.diff(indptr_np)
        )
        return CSR(
            data=as_value_array(data, dtype),
            indices=as_index_array(indices),
            indptr=as_index_array(indptr_np),
            row_ids=as_index_array(row_ids),
            shape=(int(nrow), int(ncol)),
        )

    @staticmethod
    def from_scipy(mat, *, dtype=None) -> "CSR":
        m = mat.tocsr()
        m.sort_indices()
        return CSR.from_arrays(m.data, m.indices, m.indptr, m.shape, dtype=dtype)

    # -- properties --------------------------------------------------------

    @property
    def nnz(self) -> int:
        return int(self.data.shape[0])

    @property
    def nrow(self) -> int:
        return self.shape[0]

    @property
    def ncol(self) -> int:
        return self.shape[1]

    @property
    def dtype(self):
        return self.data.dtype

    # -- derived quantities ------------------------------------------------

    def row_lengths(self) -> np.ndarray:
        """Host-side nnz per row (used by partitioners and ELL conversion)."""
        return np.diff(np.asarray(self.indptr))

    def diagonal(self) -> jax.Array:
        """Row-aligned main diagonal, zero where a row has no diagonal entry.

        Fixes reference quirk Q7 (`/root/reference/src/matrix.cpp:146-153`):
        the reference appends diagonal entries in encounter order, which only
        matches rows when every row has a diagonal entry.
        """
        n = min(self.shape)
        mask = self.row_ids == self.indices
        diag = jnp.zeros(self.shape[0], dtype=self.data.dtype)
        diag = diag.at[jnp.where(mask, self.row_ids, self.shape[0])].add(
            jnp.where(mask, self.data, 0.0), mode="drop"
        )
        return diag[:n]

    # -- converters --------------------------------------------------------

    def to_coo(self) -> COO:
        return COO(
            row=self.row_ids,
            col=self.indices,
            data=self.data,
            shape=self.shape,
            rows_sorted=True,
        )

    def todense(self) -> jax.Array:
        return self.to_coo().todense()

    def to_scipy(self):
        import scipy.sparse as sp

        return sp.csr_matrix(
            (np.asarray(self.data), np.asarray(self.indices), np.asarray(self.indptr)),
            shape=self.shape,
        )

    def astype(self, dtype) -> "CSR":
        return CSR(
            data=self.data.astype(dtype),
            indices=self.indices,
            indptr=self.indptr,
            row_ids=self.row_ids,
            shape=self.shape,
        )

    def __repr__(self) -> str:  # pragma: no cover
        return f"CSR(shape={self.shape}, nnz={self.nnz}, dtype={self.data.dtype})"
