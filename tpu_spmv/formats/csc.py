"""CSC (compressed sparse column) format.

Reference parity: ``CSCMatrix`` (`/root/reference/include/matrix.h:49-68`,
conversion `/root/reference/src/matrix.cpp:272-418`).  The reference's CSC
SpMV is an atomic column scatter (`/root/reference/src/mat_vec.cpp:82-93`);
on TPU the same computation is a gather of x by column id followed by a
segmented reduction over row ids — deterministic and atomic-free.  ``col_ids``
(expanded ``indptr``) is carried for exactly that purpose.

Note: the reference's ``operator=(const COOMatrix&)`` mixes up nrow/ncol loop
bounds and is broken for rectangular matrices (SURVEY.md Q8,
`/root/reference/src/matrix.cpp:380-393`); this implementation handles
rectangular shapes uniformly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import as_index_array, as_value_array, sparse_dataclass, static_field
from .coo import COO

__all__ = ["CSC"]


@sparse_dataclass
class CSC:
    """Compressed-sparse-column matrix.

    Attributes:
      data: ``[nnz]`` values, column-major (sorted by column, then row).
      indices: ``[nnz] int32`` row index per entry.
      indptr: ``[ncol+1] int32`` column pointer.
      col_ids: ``[nnz] int32`` column index per entry (expanded indptr).
      shape: static ``(nrow, ncol)``.
    """

    data: jax.Array
    indices: jax.Array
    indptr: jax.Array
    col_ids: jax.Array
    shape: tuple[int, int] = static_field()

    # -- construction ------------------------------------------------------

    @staticmethod
    def from_coo(coo: COO) -> "CSC":
        """COO → CSC: counting sort over columns, vectorized
        (reference shape: `/root/reference/src/matrix.cpp:295-325`)."""
        row = np.asarray(coo.row)
        col = np.asarray(coo.col)
        data = np.asarray(coo.data)
        nrow, ncol = coo.shape
        order = np.lexsort((row, col))
        row, col, data = row[order], col[order], data[order]
        counts = np.bincount(col, minlength=ncol)
        indptr = np.zeros(ncol + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        return CSC(
            data=jnp.asarray(data, dtype=coo.data.dtype),
            indices=as_index_array(row),
            indptr=as_index_array(indptr),
            col_ids=as_index_array(col),
            shape=(int(nrow), int(ncol)),
        )

    @staticmethod
    def from_arrays(data, indices, indptr, shape, *, dtype=None) -> "CSC":
        indptr_np = np.asarray(indptr, dtype=np.int64)
        nrow, ncol = shape
        if indptr_np.shape != (ncol + 1,):
            raise ValueError(f"indptr must have shape ({ncol + 1},)")
        col_ids = np.repeat(np.arange(ncol, dtype=np.int64), np.diff(indptr_np))
        return CSC(
            data=as_value_array(data, dtype),
            indices=as_index_array(indices),
            indptr=as_index_array(indptr_np),
            col_ids=as_index_array(col_ids),
            shape=(int(nrow), int(ncol)),
        )

    @staticmethod
    def from_scipy(mat, *, dtype=None) -> "CSC":
        m = mat.tocsc()
        m.sort_indices()
        return CSC.from_arrays(m.data, m.indices, m.indptr, m.shape, dtype=dtype)

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

    # -- converters --------------------------------------------------------

    def to_coo(self) -> COO:
        coo = COO(
            row=self.indices,
            col=self.col_ids,
            data=self.data,
            shape=self.shape,
            rows_sorted=False,
        )
        return coo

    def todense(self) -> jax.Array:
        return self.to_coo().todense()

    def to_scipy(self):
        import scipy.sparse as sp

        return sp.csc_matrix(
            (np.asarray(self.data), np.asarray(self.indices), np.asarray(self.indptr)),
            shape=self.shape,
        )

    def astype(self, dtype) -> "CSC":
        return CSC(
            data=self.data.astype(dtype),
            indices=self.indices,
            indptr=self.indptr,
            col_ids=self.col_ids,
            shape=self.shape,
        )

    def __repr__(self) -> str:  # pragma: no cover
        return f"CSC(shape={self.shape}, nnz={self.nnz}, dtype={self.data.dtype})"
