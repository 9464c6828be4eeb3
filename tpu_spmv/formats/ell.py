"""ELL (ELLPACK) format — the most TPU-friendly irregular-sparse layout.

Reference parity: ``ELLMatrix`` (`/root/reference/include/matrix.h:70-92`,
conversion `/root/reference/src/matrix.cpp:423-613`).  The reference stores
ELL **column-major** (slot-major, ``col_ind[row + slot*nrow]``) so its inner
loop vectorizes over rows on ARM SIMD.  On TPU we store the transpose-free
**row-major** dense pair ``data/cols: [nrow, width]`` — dense 2-D arrays are
exactly what VMEM tiling wants, and SpMV becomes

    y = sum(data * x[cols] * valid, axis=1)

one gather + one row reduction, fully fused by XLA, no scatter at all.

Padding slots hold value 0 and column 0 with ``valid`` False; the width is
the max row population (same rule as the reference,
`/root/reference/src/matrix.cpp:455-470`).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import as_index_array, sparse_dataclass, static_field
from .coo import COO

__all__ = ["ELL"]


@sparse_dataclass
class ELL:
    """ELLPACK matrix with row-major dense storage.

    Attributes:
      data: ``[nrow, width]`` values, zero in padding slots.
      cols: ``[nrow, width] int32`` column ids, 0 in padding slots.
      valid: ``[nrow, width] bool`` slot-occupancy mask.
      shape: static ``(nrow, ncol)``.
      nnz: static true (unpadded) nonzero count, for GFLOPS accounting —
        the reference counts padded slots as flops for its NUMA ELL metric
        (`/root/reference/src/mat_vec.cpp:415`); we report true nnz.
    """

    data: jax.Array
    cols: jax.Array
    valid: jax.Array
    shape: tuple[int, int] = static_field()
    nnz: int = static_field()

    # -- construction ------------------------------------------------------

    @staticmethod
    def from_coo(coo: COO, *, width: int | None = None) -> "ELL":
        """COO → ELL (reference shape:
        `/root/reference/src/matrix.cpp:450-500`, with per-row fill counters;
        here: sort by row + slot index = position within row)."""
        row = np.asarray(coo.row)
        col = np.asarray(coo.col)
        data = np.asarray(coo.data)
        nrow, ncol = coo.shape
        if not coo.rows_sorted:
            order = np.lexsort((col, row))
            row, col, data = row[order], col[order], data[order]
        counts = np.bincount(row, minlength=nrow)
        max_width = int(counts.max()) if nrow and counts.size else 0
        if width is None:
            width = max_width
        elif width < max_width:
            raise ValueError(f"width={width} < max row population {max_width}")
        width = max(int(width), 1)
        # slot index of each entry within its row: position - row_start
        starts = np.zeros(nrow + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        slot = np.arange(row.size, dtype=np.int64) - starts[row]
        vals = np.zeros((nrow, width), dtype=data.dtype)
        cols_arr = np.zeros((nrow, width), dtype=np.int64)
        mask = np.zeros((nrow, width), dtype=bool)
        vals[row, slot] = data
        cols_arr[row, slot] = col
        mask[row, slot] = True
        return ELL(
            data=jnp.asarray(vals, dtype=coo.data.dtype),
            cols=as_index_array(cols_arr),
            valid=jnp.asarray(mask),
            shape=(int(nrow), int(ncol)),
            nnz=int(row.size),
        )

    # -- properties --------------------------------------------------------

    @property
    def width(self) -> int:
        return int(self.data.shape[1])

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
        mask = np.asarray(self.valid)
        row, slot = np.nonzero(mask)
        return COO.from_arrays(
            row,
            np.asarray(self.cols)[row, slot],
            np.asarray(self.data)[row, slot],
            self.shape,
            dtype=self.data.dtype,
        )

    def todense(self) -> jax.Array:
        out = jnp.zeros(self.shape, dtype=self.data.dtype)
        return out.at[
            jnp.broadcast_to(jnp.arange(self.nrow)[:, None], self.cols.shape),
            self.cols,
        ].add(jnp.where(self.valid, self.data, 0.0))

    def astype(self, dtype) -> "ELL":
        return ELL(
            data=self.data.astype(dtype),
            cols=self.cols,
            valid=self.valid,
            shape=self.shape,
            nnz=self.nnz,
        )

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"ELL(shape={self.shape}, width={self.width}, nnz={self.nnz}, "
            f"dtype={self.data.dtype})"
        )
