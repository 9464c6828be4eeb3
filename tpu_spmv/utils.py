"""Synthetic test-matrix generators and small shared helpers.

The reference ships no fixtures (its driver takes an external .mtx path,
`/root/reference/main.cpp:20-26`); with zero network egress the test suite
and benchmarks generate their own SuiteSparse-like structures instead:

- :func:`laplacian_2d` — 5-point Poisson stencil, the canonical "structured
  PDE matrix" (BASELINE.json config 4) and a natural DIA/BSR citizen.
- :func:`random_sparse` — uniform-random pattern, the ELL worst case.
- :func:`banded` — fixed bandwidth, the DIA best case.
- :func:`power_law` — skewed row lengths, exercises load-balance paths.
"""

from __future__ import annotations

import functools
import os
import subprocess

import numpy as np
import scipy.sparse as sp

__all__ = ["laplacian_2d", "random_sparse", "banded", "power_law",
           "block_laplacian", "ensure_native_built", "tune_host_allocator"]


@functools.cache
def tune_host_allocator() -> bool:
    """Make glibc KEEP and REUSE its large-allocation arena.

    On lazily-restored VM hosts (this TPU environment included), the
    hypervisor demand-loads guest-physical pages at ~6 MB/s on first
    touch — a fresh 128 MB numpy buffer costs ~20 s while a reused one
    costs 15 ms (measured; the guest reports no page faults, so this is
    invisible to normal profiling).  glibc's default behavior mmaps every
    large chunk and unmaps it on free, so each pack/convert pays the
    first-touch cost again.  Raising M_MMAP_THRESHOLD and
    M_TRIM_THRESHOLD routes large allocations through the sbrk heap and
    never returns the pages — after a one-time warmup, all host-side
    packing runs at memory speed.

    Harmless elsewhere (standard HPC allocator tuning).  Disable with
    ``TPU_SPMV_NO_MALLOPT=1``.
    """
    if os.environ.get("TPU_SPMV_NO_MALLOPT"):
        return False
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        one_gb = 1 << 30
        ok = libc.mallopt(-3, one_gb)   # M_MMAP_THRESHOLD
        ok &= libc.mallopt(-1, one_gb)  # M_TRIM_THRESHOLD
        return bool(ok)
    except Exception:
        return False


@functools.cache
def ensure_native_built() -> bool:
    """Build ``native/`` (the C++ mmio parser and permutation router) on
    first use when the .so files are missing — fresh environments only
    carry the sources, and the Python routing fallback is ~50x slower
    (observed: a 700k-nnz GPR pack at 131s vs 2.6s).  Best-effort: any
    failure leaves the graceful pure-Python fallbacks in place."""
    root = os.path.join(os.path.dirname(__file__), "..", "native")
    targets = ("libmmio_fast.so", "libpermute_router.so")
    if not os.path.exists(os.path.join(root, "Makefile")):
        return False
    if all(os.path.exists(os.path.join(root, t)) for t in targets):
        return True
    try:
        subprocess.run(["make", "-C", root], check=True, timeout=120,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except Exception:
        return False
    return all(os.path.exists(os.path.join(root, t)) for t in targets)


def laplacian_2d(nx: int, ny: int | None = None, dtype=np.float64) -> sp.csr_matrix:
    """5-point 2-D Laplacian on an ``nx × ny`` grid (SPD, pentadiagonal)."""
    ny = nx if ny is None else ny
    ex = np.ones(nx)
    ey = np.ones(ny)
    Tx = sp.diags([-ex[:-1], 2 * ex, -ex[:-1]], [-1, 0, 1])
    Ty = sp.diags([-ey[:-1], 2 * ey, -ey[:-1]], [-1, 0, 1])
    A = sp.kronsum(Tx, Ty, format="csr").astype(dtype)
    A.sort_indices()
    return A


def laplacian_3d(nx: int, ny: int | None = None, nz: int | None = None,
                 dtype=np.float64) -> sp.csr_matrix:
    """7-point 3-D Laplacian on an ``nx × ny × nz`` grid (SPD,
    heptadiagonal: offsets 0, ±1, ±nz, ±ny·nz).  Every diagonal is
    periodic (periods nz / ny·nz), so the planner routes it to the
    periodic streaming kernel like its 2-D sibling."""
    ny = nx if ny is None else ny
    nz = ny if nz is None else nz

    def T(m):
        e = np.ones(m)
        return sp.diags([-e[:-1], 2 * e, -e[:-1]], [-1, 0, 1])

    A = sp.kronsum(sp.kronsum(T(nz), T(ny)), T(nx), format="csr")
    A = A.astype(dtype)
    A.sort_indices()
    return A


def random_sparse(
    nrow: int, ncol: int, density: float = 0.01, seed: int = 0, dtype=np.float64
) -> sp.csr_matrix:
    """Uniform random sparse matrix with standard-normal values."""
    rng = np.random.default_rng(seed)
    A = sp.random(
        nrow, ncol, density=density, random_state=rng,
        data_rvs=rng.standard_normal, format="csr", dtype=np.float64,
    ).astype(dtype)
    A.sum_duplicates()
    A.sort_indices()
    return A


def banded(n: int, bandwidth: int = 5, seed: int = 0, dtype=np.float64) -> sp.csr_matrix:
    """Dense band of half-width ``bandwidth`` around the main diagonal."""
    rng = np.random.default_rng(seed)
    offsets = list(range(-bandwidth, bandwidth + 1))
    diags = [rng.standard_normal(n - abs(k)) for k in offsets]
    A = sp.diags(diags, offsets, shape=(n, n), format="csr").astype(dtype)
    A.sort_indices()
    return A


def block_laplacian(nx: int, bs: int = 8, seed: int = 0,
                    dtype=np.float64) -> sp.csr_matrix:
    """Structured-PDE block matrix: 2-D Laplacian pattern with dense
    ``bs x bs`` blocks (BASELINE.json config 4's matrix family) — e.g. a
    vector-valued PDE with ``bs`` coupled components per grid point."""
    rng = np.random.default_rng(seed)
    pattern = laplacian_2d(nx)
    pattern_coo = pattern.tocoo()
    blocks = rng.standard_normal((pattern_coo.nnz, bs, bs))
    A = sp.bsr_matrix(
        (blocks, pattern_coo.col, pattern_coo.tocsr().indptr),
        shape=(pattern.shape[0] * bs, pattern.shape[1] * bs),
    ).tocsr().astype(dtype)
    A.sort_indices()
    return A


def power_law(
    nrow: int, ncol: int, avg_nnz_per_row: int = 8, alpha: float = 1.5,
    seed: int = 0, dtype=np.float64,
) -> sp.csr_matrix:
    """Rows with power-law-distributed lengths (load-imbalance stressor).

    The reference's even row split ignores nnz skew
    (`/root/reference/src/mat_vec.cpp:163-168`); matrices from this generator
    are what the nnz-balanced partitioner in ``tpu_spmv.dist`` is tested on.
    """
    rng = np.random.default_rng(seed)
    raw = rng.pareto(alpha, size=nrow) + 1.0
    lengths = np.minimum(
        np.maximum((raw * avg_nnz_per_row / raw.mean()).astype(np.int64), 1), ncol
    )
    rows = np.repeat(np.arange(nrow), lengths)
    cols = np.concatenate([
        rng.choice(ncol, size=l, replace=False) for l in lengths
    ])
    vals = rng.standard_normal(rows.size)
    A = sp.csr_matrix((vals, (rows, cols)), shape=(nrow, ncol)).astype(dtype)
    A.sum_duplicates()
    A.sort_indices()
    return A
