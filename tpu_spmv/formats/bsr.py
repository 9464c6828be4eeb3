"""BSR (block sparse row) format — the MXU-native sparse layout.

Reference parity: the reference *declares* a block format but never implements
it — ``BlockMatrix`` copies scalar dims only, has no data and no SpMV
(`/root/reference/include/matrix.h:94-116`,
`/root/reference/src/matrix.cpp:619-632`; SURVEY.md component #7 "STUB").
BASELINE.json config 4 elevates it to a real deliverable: 8×8-block SpMV on a
structured PDE matrix, MXU-tiled.

TPU layout: dense block stack ``data: [nblocks, bs, bs]`` + CSR-style block
index arrays.  SpMV gathers x block-wise (contiguous ``bs``-vectors, not
scalars) and contracts each block on the MXU via ``einsum('nij,nj->ni')``;
SpMM (multi-RHS) contracts ``[bs, bs] @ [bs, nrhs]`` per block — genuinely
MXU-shaped work, which no scalar format can offer.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import as_index_array, sparse_dataclass, static_field
from .coo import COO

__all__ = ["BSR"]


@sparse_dataclass
class BSR:
    """Block-sparse-row matrix with square ``bs × bs`` blocks.

    The logical shape is ``shape``; storage is padded up to whole blocks
    (``nbrow*bs × nbcol*bs``) with explicit zeros, so kernels always see
    uniform block shapes (static-shape requirement of XLA).

    Attributes:
      data: ``[nblocks, bs, bs]`` dense blocks, block-row-major order.
      indices: ``[nblocks] int32`` block-column id per block.
      indptr: ``[nbrow+1] int32`` block-row pointer.
      block_row_ids: ``[nblocks] int32`` block-row id per block.
      shape: static logical ``(nrow, ncol)``.
      block_size: static block edge ``bs``.
      nnz: static true scalar nonzero count (GFLOPS accounting).
    """

    data: jax.Array
    indices: jax.Array
    indptr: jax.Array
    block_row_ids: jax.Array
    shape: tuple[int, int] = static_field()
    block_size: int = static_field()
    nnz: int = static_field()

    # -- construction ------------------------------------------------------

    @staticmethod
    def from_coo(coo: COO, block_size: int = 8) -> "BSR":
        bs = int(block_size)
        if bs < 1:
            raise ValueError("block_size must be >= 1")
        row = np.asarray(coo.row).astype(np.int64)
        col = np.asarray(coo.col).astype(np.int64)
        vals = np.asarray(coo.data)
        nrow, ncol = coo.shape
        nbrow = -(-nrow // bs) if nrow else 0
        nbcol = -(-ncol // bs) if ncol else 0
        brow, bcol = row // bs, col // bs
        # unique occupied blocks, block-row-major
        key = brow * max(nbcol, 1) + bcol
        uniq_keys, block_of_entry = np.unique(key, return_inverse=True)
        nblocks = max(len(uniq_keys), 1)
        ub_row = uniq_keys // max(nbcol, 1)
        ub_col = uniq_keys % max(nbcol, 1)
        data = np.zeros((nblocks, bs, bs), dtype=vals.dtype)
        if row.size:
            np.add.at(data, (block_of_entry, row % bs, col % bs), vals)
        if len(uniq_keys) == 0:
            ub_row = np.zeros(1, dtype=np.int64)
            ub_col = np.zeros(1, dtype=np.int64)
        counts = np.bincount(ub_row, minlength=max(nbrow, 1))
        indptr = np.zeros(max(nbrow, 1) + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        return BSR(
            data=jnp.asarray(data, dtype=coo.data.dtype),
            indices=as_index_array(ub_col),
            indptr=as_index_array(indptr),
            block_row_ids=as_index_array(ub_row),
            shape=(int(nrow), int(ncol)),
            block_size=bs,
            nnz=int(row.size),
        )

    # -- properties --------------------------------------------------------

    @property
    def nblocks(self) -> int:
        return int(self.data.shape[0])

    @property
    def nbrow(self) -> int:
        return int(self.indptr.shape[0]) - 1

    @property
    def nbcol(self) -> int:
        return -(-self.shape[1] // self.block_size) if self.shape[1] else 0

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
        brow = np.asarray(self.block_row_ids).astype(np.int64)
        bcol = np.asarray(self.indices).astype(np.int64)
        b, i, j = np.nonzero(data)
        rows = brow[b] * bs + i
        cols = bcol[b] * bs + j
        keep = (rows < self.shape[0]) & (cols < self.shape[1])
        return COO.from_arrays(
            rows[keep], cols[keep], data[b, i, j][keep], self.shape,
            dtype=self.data.dtype,
        )

    def todense(self) -> jax.Array:
        return self.to_coo().todense()

    def astype(self, dtype) -> "BSR":
        return BSR(
            data=self.data.astype(dtype),
            indices=self.indices,
            indptr=self.indptr,
            block_row_ids=self.block_row_ids,
            shape=self.shape,
            block_size=self.block_size,
            nnz=self.nnz,
        )

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"BSR(shape={self.shape}, bs={self.block_size}, "
            f"nblocks={self.nblocks}, nnz={self.nnz}, dtype={self.data.dtype})"
        )
