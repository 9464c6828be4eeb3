"""Matrix / vector I/O: MatrixMarket (pure-Python + C++ fast path)."""

from .mmio import (
    MMHeader, read_header, read_matrix, read_mtx_arrays, write_matrix,
    read_dense, write_dense,
)

__all__ = [
    "MMHeader", "read_header", "read_matrix", "read_mtx_arrays",
    "write_matrix", "read_dense", "write_dense",
]
