"""DIA (diagonal) format for banded/structured matrices.

Reference parity: ``DIAMatrix`` (`/root/reference/include/matrix.h:118-138`,
conversion from CSR `/root/reference/src/matrix.cpp:638-799`).  The reference
stores ``values[row*ndiags + d]`` row-major with an ``offsets[]`` table and
its SpMV bounds-tests every element (`/root/reference/src/mat_vec.cpp:135-145`).

TPU layout: ``data: [ndiags, nrow]`` where ``data[d, i] = A[i, i+offsets[d]]``
(zero where out of range).  SpMV is then a static per-diagonal loop of
shifted dense FMAs over an ``x`` padded by the offset range — pure
elementwise VPU work with unit-stride loads, no gather at all, which XLA
fuses into a single pass.  ``offsets`` is **static host metadata** (a tuple):
the diagonal structure determines trace-time slicing, exactly like the
reference determines its loop bounds at conversion time.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import sparse_dataclass, static_field
from .coo import COO

__all__ = ["DIA"]


@sparse_dataclass
class DIA:
    """Diagonal-format matrix.

    Attributes:
      data: ``[ndiags, nrow]`` — ``data[d, i] = A[i, i + offsets[d]]``.
      offsets: static tuple of diagonal offsets (col - row), ascending.
      shape: static ``(nrow, ncol)``.
      nnz: static true nonzero count (for GFLOPS accounting).
    """

    data: jax.Array
    offsets: tuple[int, ...] = static_field()
    shape: tuple[int, int] = static_field()
    nnz: int = static_field()

    # -- construction ------------------------------------------------------

    @staticmethod
    def host_arrays(coo: COO) -> tuple[np.ndarray, tuple[int, ...]]:
        """``([ndiags, nrow] numpy data, offsets)`` built entirely on host
        — for planning/packing paths that must not touch the device (e.g.
        periodicity detection, `kernels/dia_stream.py:detect_period`)."""
        row = np.asarray(coo.row)
        col = np.asarray(coo.col)
        vals = np.asarray(coo.data)
        nrow, _ = coo.shape
        diag_of_entry = col.astype(np.int64) - row.astype(np.int64)
        offsets, diag_idx = np.unique(diag_of_entry, return_inverse=True)
        ndiags = max(len(offsets), 1)
        data = np.zeros((ndiags, nrow), dtype=vals.dtype)
        if row.size:
            np.add.at(data, (diag_idx, row), vals)
        offs = tuple(int(o) for o in offsets) if len(offsets) else (0,)
        return data, offs

    @staticmethod
    def from_coo(coo: COO) -> "DIA":
        """COO → DIA.  The reference converts from CSR with a two-pass
        diagonal-occupancy scan (`/root/reference/src/matrix.cpp:673-726`);
        the vectorized equivalent is a unique() over (col - row)."""
        data, offs = DIA.host_arrays(coo)
        nrow, ncol = coo.shape
        return DIA(
            data=jnp.asarray(data, dtype=coo.data.dtype),
            offsets=offs,
            shape=(int(nrow), int(ncol)),
            nnz=int(np.asarray(coo.row).size),
        )

    # -- properties --------------------------------------------------------

    @property
    def ndiags(self) -> int:
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
        nrow, ncol = self.shape
        data = np.asarray(self.data)
        rows, cols, vals = [], [], []
        for d, off in enumerate(self.offsets):
            i = np.arange(nrow, dtype=np.int64)
            j = i + off
            in_range = (j >= 0) & (j < ncol)
            v = data[d]
            keep = in_range & (v != 0)
            rows.append(i[keep])
            cols.append(j[keep])
            vals.append(v[keep])
        return COO.from_arrays(
            np.concatenate(rows),
            np.concatenate(cols),
            np.concatenate(vals),
            self.shape,
            dtype=self.data.dtype,
        )

    def todense(self) -> jax.Array:
        return self.to_coo().todense()

    def astype(self, dtype) -> "DIA":
        return DIA(
            data=self.data.astype(dtype),
            offsets=self.offsets,
            shape=self.shape,
            nnz=self.nnz,
        )

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"DIA(shape={self.shape}, ndiags={self.ndiags}, nnz={self.nnz}, "
            f"dtype={self.data.dtype})"
        )
