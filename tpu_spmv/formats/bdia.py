"""BDIA (block-diagonal) format: DIA lifted to dense blocks — MXU food.

No reference analog (the reference stubs even plain blocks,
`/root/reference/src/matrix.cpp:619-632`); this is the TPU-native answer to
BASELINE.json config 4 ("BSR SpMV, 8x8 blocks, structured PDE matrix").

Observation: structured-PDE block matrices are **block-banded** — the
occupied blocks sit on a handful of block-diagonals.  Storing per
block-diagonal eliminates all index arrays and all gathers:

    y_blocks += einsum('nij,nj->ni', diag_d_blocks, x_blocks shifted by d)

Every operand is a contiguous dense array; the contraction feeds the
MXU/VPU, x shifts are static slices, and the whole SpMV is a short static
chain XLA fuses aggressively — the same recipe that makes scalar DIA run at
memory speed, with 64x the arithmetic intensity per index.

Storage: ``data[d, b] = A_block[b, b + offsets[d]]`` (zero where out of
range), shape ``[ndiags, nbrow, bs, bs]``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import sparse_dataclass, static_field
from .coo import COO

__all__ = ["BDIA"]


@sparse_dataclass
class BDIA:
    """Block-diagonal sparse matrix with square ``bs x bs`` blocks.

    Attributes:
      data: ``[ndiags, nbrow, bs, bs]`` — block ``(d, b)`` is
        ``A[b*bs:(b+1)*bs, (b+offsets[d])*bs : ...+bs]``.
      offsets: static tuple of block-diagonal offsets, ascending.
      shape: static logical ``(nrow, ncol)``.
      block_size: static block edge.
      nnz: static true scalar nonzero count.
    """

    data: jax.Array
    offsets: tuple[int, ...] = static_field()
    shape: tuple[int, int] = static_field()
    block_size: int = static_field()
    nnz: int = static_field()

    # -- construction ------------------------------------------------------

    @staticmethod
    def from_coo(coo: COO, block_size: int = 8) -> "BDIA":
        bs = int(block_size)
        row = np.asarray(coo.row).astype(np.int64)
        col = np.asarray(coo.col).astype(np.int64)
        vals = np.asarray(coo.data)
        nrow, ncol = coo.shape
        nbrow = max(-(-nrow // bs), 1)
        brow, bcol = row // bs, col // bs
        diag = bcol - brow
        offsets, diag_idx = np.unique(diag, return_inverse=True)
        if len(offsets) == 0:
            offsets = np.zeros(1, dtype=np.int64)
            diag_idx = np.zeros(0, dtype=np.int64)
        data = np.zeros((len(offsets), nbrow, bs, bs), dtype=vals.dtype)
        if row.size:
            np.add.at(data, (diag_idx, brow, row % bs, col % bs), vals)
        return BDIA(
            data=jnp.asarray(data, dtype=coo.data.dtype),
            offsets=tuple(int(o) for o in offsets),
            shape=(int(nrow), int(ncol)),
            block_size=bs,
            nnz=int(row.size),
        )

    # -- properties --------------------------------------------------------

    @property
    def ndiags(self) -> int:
        return int(self.data.shape[0])

    @property
    def nbrow(self) -> int:
        return int(self.data.shape[1])

    @property
    def nbcol(self) -> int:
        return -(-self.shape[1] // self.block_size) if self.shape[1] else 1

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
        bs = self.block_size
        data = np.asarray(self.data)
        d, b, i, j = np.nonzero(data)
        rows = b * bs + i
        cols = (b + np.asarray(self.offsets)[d]) * bs + j
        keep = (
            (rows < self.shape[0]) & (cols >= 0) & (cols < self.shape[1])
        )
        return COO.from_arrays(
            rows[keep], cols[keep], data[d, b, i, j][keep], self.shape,
            dtype=self.data.dtype,
        )

    def todense(self) -> jax.Array:
        return self.to_coo().todense()

    def astype(self, dtype) -> "BDIA":
        return BDIA(
            data=self.data.astype(dtype),
            offsets=self.offsets,
            shape=self.shape,
            block_size=self.block_size,
            nnz=self.nnz,
        )

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"BDIA(shape={self.shape}, bs={self.block_size}, "
            f"ndiags={self.ndiags}, nnz={self.nnz}, dtype={self.data.dtype})"
        )
