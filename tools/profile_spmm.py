#!/usr/bin/env python
"""On-chip GPR SpMM crossover probe: batched pipeline vs mapped per-rhs
SpMVs at several nrhs, on the bench's 700k-nnz random matrix.

Decides SPMM_BATCH_MAX_NRHS (the cap predates the engine-v2 fused
stages, which changed both paths' costs).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_spmv.bench.harness import time_chained
from tpu_spmv.kernels import gpr
from tpu_spmv.utils import random_sparse


def log(*a):
    print(*a, flush=True)


def main():
    n = 100_000
    sp_mat = random_sparse(n, n, 7e-5, seed=2, dtype=np.float32)
    t0 = time.time()
    A = gpr.pack_gpr(sp_mat, dtype=np.float32)
    log(f"pack {sp_mat.nnz} nnz in {time.time() - t0:.1f}s fused={A.fused}")
    scale = np.float32(1.0 / abs(sp_mat).sum(axis=1).max())
    rng = np.random.default_rng(3)

    for nrhs in (8, 16, 32):
        X = jnp.asarray(rng.random((n, nrhs)), jnp.float32)
        # correctness once per size (batched path)
        gpr.SPMM_BATCH_MAX_NRHS = 1024
        Y = np.asarray(gpr.spmm_gpr(A, X))
        ref = sp_mat.astype(np.float64) @ np.asarray(X, np.float64)
        rel = np.abs(Y - ref).max() / np.abs(ref).max()
        assert rel < 2e-5, f"nrhs={nrhs}: rel={rel:.2e}"

        dt_b = time_chained(lambda C, M: gpr.spmm_gpr(M, C) * scale, X,
                            iters=30, warm=3, operands=(A,))
        gpr.SPMM_BATCH_MAX_NRHS = 0          # force mapped path
        dt_m = time_chained(lambda C, M: gpr.spmm_gpr(M, C) * scale, X,
                            iters=30, warm=3, operands=(A,))
        log(f"nrhs={nrhs:3d}: batched {dt_b * 1e3:7.3f} ms | mapped "
            f"{dt_m * 1e3:7.3f} ms | ratio {dt_m / dt_b:5.2f}x | "
            f"batched {2 * sp_mat.nnz * nrhs / dt_b / 1e9:6.1f} GFLOP/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
