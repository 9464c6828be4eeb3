"""tpu_spmv — a TPU-native sparse linear-algebra framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capability surface of
the ARM NUMA SpMV library ``ChuheHong/arm-spmv`` (see SURVEY.md):

- **Formats** (``tpu_spmv.formats``): COO, CSR, CSC, ELL, DIA, BSR as
  immutable pytree dataclasses; conversions between all of them.
- **Ops** (``tpu_spmv.ops``): SpMV/SpMM per format as scatter-free XLA
  kernels; BLAS-1 vector ops.
- **Kernels** (``tpu_spmv.kernels``): hand-tiled Pallas TPU kernels for the
  hot formats (CSR row-block, ELL, BSR/MXU).
- **Distribution** (``tpu_spmv.dist``): the reference's NUMA partition +
  pthread layer re-imagined as mesh sharding — row-partitioned matrices over
  ``jax.sharding.Mesh``, ``shard_map``-wrapped local SpMV, all-gather /
  reduce-scatter / overlapped ``ppermute`` halo exchange.
- **I/O** (``tpu_spmv.io``): MatrixMarket read/write (symmetric expansion,
  pattern support), vector text I/O, C++ fast-path parser.
- **Bench** (``tpu_spmv.bench``): the reference's GFLOPS protocol
  (``### <FMT> <MODE> GFLOPS``) plus a memory-bandwidth roofline model.
"""

from __future__ import annotations

from .utils import tune_host_allocator as _tune_host_allocator

# keep glibc's large-allocation arena warm: on lazily-paged VM hosts a
# fresh numpy buffer faults in at ~6 MB/s while a reused one runs at
# memory speed (see utils.tune_host_allocator)
_tune_host_allocator()

from .formats import COO, CSR, CSC, ELL, DIA, BSR, BDIA, convert, to_coo, FORMATS
from .ops import (
    spmv, spmm, dot, axpby, axpy, fill, fill_random, scale, shift,
    norm2, check_vector, allclose, plan_spmv, transpose,
    shift_diagonal, spgemm, spgemm_csr,
)
from .io import read_matrix, write_matrix, read_dense, write_dense
from . import solvers

__version__ = "0.1.0"

__all__ = [
    "COO", "CSR", "CSC", "ELL", "DIA", "BSR", "BDIA", "convert", "to_coo",
    "FORMATS",
    "spmv", "spmm", "dot", "axpby", "axpy", "fill", "fill_random", "scale",
    "shift", "norm2", "check_vector", "allclose", "plan_spmv", "transpose",
    "shift_diagonal", "spgemm", "spgemm_csr",
    "read_matrix", "write_matrix", "read_dense", "write_dense",
    "solvers",
    "__version__",
]
