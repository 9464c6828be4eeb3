#!/usr/bin/env python
"""On-chip PSELL cost calibration: time spmv_pallas across patterns with
different (ntiles, rounds) and fit the planner's per-tile-round constant
(ops/auto.pallas_ell_cost_s).  Run after kernel changes (round-2: the
per-tile mask-dot moved to one fat per-step dot)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from tpu_spmv.bench.harness import time_chained
from tpu_spmv.kernels import ell_pallas
from tpu_spmv.formats import COO


def log(*a):
    print(*a, flush=True)


def clustered(nrow, ncol, per_row, nseg_row, seed):
    """Rows draw per_row entries from nseg_row random 128-col segments —
    the PSELL sweet spot (few gather rounds)."""
    rng = np.random.default_rng(seed)
    S = ncol // 128
    rows = np.repeat(np.arange(nrow), per_row)
    seg_choice = rng.integers(0, S, (nrow, nseg_row))
    segs = seg_choice[rows % nrow, rng.integers(0, nseg_row, len(rows))]
    cols = segs * 128 + rng.integers(0, 128, len(rows))
    m = sp.csr_matrix((rng.random(len(rows)), (rows, cols)),
                      shape=(nrow, ncol))
    m.sum_duplicates()
    return m


def main():
    for nrow, per_row, nseg in ((200_000, 12, 2), (200_000, 12, 4),
                                (800_000, 6, 2)):
        m = clustered(nrow, nrow, per_row, nseg, seed=1)
        coo = m.tocoo()
        A = ell_pallas.pack_ell(
            COO.from_arrays(coo.row, coo.col, coo.data, m.shape,
                            dtype=np.float32), max_rounds=48,
            dtype=np.float32)
        x = jnp.asarray(np.random.default_rng(2).random(nrow), jnp.float32)
        y = np.asarray(ell_pallas.spmv_pallas(A, x))
        ref = m.astype(np.float64) @ np.asarray(x, np.float64)
        rel = np.abs(y - ref).max() / np.abs(ref).max()
        assert rel < 2e-5, rel
        scale = np.float32(1.0 / max(float(np.abs(m).sum(axis=1).max()), 1))
        dt = time_chained(
            lambda c, M: ell_pallas.spmv_pallas(M, c) * scale, x,
            iters=100, warm=10, operands=(A,))
        tr = A.ntiles * A.rounds
        log(f"nrow={nrow} T={A.ntiles} rounds={A.rounds} "
            f"uniform={A.tile_uniform}: {dt * 1e6:7.1f} us "
            f"({dt / tr * 1e9:5.1f} ns/tile-round, "
            f"{2 * m.nnz / dt / 1e9:5.1f} GFLOP/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
