"""COO (coordinate) sparse format — the canonical ingest format.

Reference parity: ``COOMatrix`` (`/root/reference/include/matrix.h:7-25`,
`/root/reference/src/matrix.cpp:10-81`).  The reference stores three parallel
heap arrays ``(row_ind, col_ind, values)``; here they are three device-array
leaves of an immutable pytree, so a COO matrix can be passed through
``jit``/``shard_map`` directly.

TPU notes: COO SpMV is a gather + segmented reduction
(``jax.ops.segment_sum``) rather than the reference's atomic scatter loop
(`/root/reference/src/mat_vec.cpp:30-40`) — TPUs have no atomics, and the
segment-sum formulation is both deterministic and vectorizable.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import (
    INDEX_DTYPE,
    as_index_array,
    as_value_array,
    sparse_dataclass,
    static_field,
)

__all__ = ["COO"]


@sparse_dataclass
class COO:
    """Coordinate-format sparse matrix.

    Attributes:
      row: ``[nnz] int32`` row index of each stored entry.
      col: ``[nnz] int32`` column index of each stored entry.
      data: ``[nnz]`` value of each stored entry.
      shape: static ``(nrow, ncol)``.
      rows_sorted: static flag — True when entries are sorted by
        (row, col); conversions exploit this.
    """

    row: jax.Array
    col: jax.Array
    data: jax.Array
    shape: tuple[int, int] = static_field()
    rows_sorted: bool = static_field(default=False)

    # -- construction ------------------------------------------------------

    @staticmethod
    def from_arrays(row, col, data, shape, *, dtype=None, sort: bool = True) -> "COO":
        """Build a COO matrix from host or device index/value arrays.

        Unlike the reference (which keeps file order,
        `/root/reference/src/data_io.cpp:83-88`), entries are sorted by
        (row, col) by default: sorted order is what makes TPU segment
        reductions fast (``indices_are_sorted=True``) and makes conversions
        cheap.  Pass ``sort=False`` to keep ingest order.
        """
        row = np.asarray(row)
        col = np.asarray(col)
        data = np.asarray(data)
        if not (row.shape == col.shape == data.shape) or row.ndim != 1:
            raise ValueError(
                f"row/col/data must be equal-length 1-D arrays, got "
                f"{row.shape}/{col.shape}/{data.shape}"
            )
        nrow, ncol = shape
        if row.size:
            if row.min() < 0 or row.max() >= nrow:
                raise ValueError(f"row indices out of range for nrow={nrow}")
            if col.min() < 0 or col.max() >= ncol:
                raise ValueError(f"col indices out of range for ncol={ncol}")
        sorted_flag = False
        if sort and row.size:
            order = np.lexsort((col, row))
            row, col, data = row[order], col[order], data[order]
            sorted_flag = True
        return COO(
            row=as_index_array(row),
            col=as_index_array(col),
            data=as_value_array(data, dtype),
            shape=(int(nrow), int(ncol)),
            rows_sorted=sorted_flag,
        )

    @staticmethod
    def from_dense(dense, *, dtype=None) -> "COO":
        dense = np.asarray(dense)
        row, col = np.nonzero(dense)
        return COO.from_arrays(row, col, dense[row, col], dense.shape, dtype=dtype)

    @staticmethod
    def from_scipy(mat, *, dtype=None) -> "COO":
        """Build from any scipy.sparse matrix (test-oracle interop)."""
        m = mat.tocoo()
        return COO.from_arrays(m.row, m.col, m.data, m.shape, dtype=dtype)

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

    def todense(self) -> jax.Array:
        """Dense ``[nrow, ncol]`` array (duplicates accumulate)."""
        out = jnp.zeros(self.shape, dtype=self.data.dtype)
        return out.at[self.row, self.col].add(self.data)

    def to_scipy(self):
        import scipy.sparse as sp

        data = np.asarray(self.data)
        if data.dtype not in (np.float32, np.float64):
            # scipy has no bfloat16 (or other narrow) dtype — widen
            data = data.astype(np.float32)
        return sp.coo_matrix(
            (data, (np.asarray(self.row), np.asarray(self.col))),
            shape=self.shape,
        )

    def sort_by_row(self) -> "COO":
        """Return an equivalent COO with entries sorted by (row, col)."""
        if self.rows_sorted:
            return self
        row = np.asarray(self.row)
        col = np.asarray(self.col)
        data = np.asarray(self.data)
        order = np.lexsort((col, row))
        return COO(
            row=as_index_array(row[order]),
            col=as_index_array(col[order]),
            data=jnp.asarray(data[order], dtype=self.data.dtype),
            shape=self.shape,
            rows_sorted=True,
        )

    def astype(self, dtype) -> "COO":
        return COO(
            row=self.row,
            col=self.col,
            data=self.data.astype(dtype),
            shape=self.shape,
            rows_sorted=self.rows_sorted,
        )

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return (
            f"COO(shape={self.shape}, nnz={self.nnz}, dtype={self.data.dtype}, "
            f"rows_sorted={self.rows_sorted})"
        )
