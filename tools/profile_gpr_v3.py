#!/usr/bin/env python
"""A/B the engine-v3 GPR pipeline against v2 on chip, one process.

Packs the 700k-nnz uniform-random bench matrix both ways and times SpMV
(and optionally SpMM) with the chained protocol.  Expected from the
kernel probe (tools/probe_engine_v3.py): ~220-330 ns/tile better stage-3,
~20 us on the ~143 us v2 SpMV.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from tpu_spmv.bench.harness import time_chained
from tpu_spmv.kernels import gpr


def log(*a):
    print(*a, flush=True)


def main():
    rng = np.random.default_rng(0)
    n, nnz = 100_000, 700_000
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    m = sp.csr_matrix((rng.random(nnz), (rows, cols)), shape=(n, n))
    x = jnp.asarray(rng.random(n).astype(np.float32))
    ref = m.astype(np.float64) @ np.asarray(x, np.float64)

    packs = {}
    for name, flag in (("v2", False), ("v3", True)):
        gpr.ENGINE_V3 = flag
        t0 = time.time()
        A = gpr.pack_gpr(m)
        log(f"{name}: pack {time.time() - t0:.1f}s fused_v3={A.fused_v3}")
        y = np.asarray(gpr.spmv_gpr(A, x), np.float64)
        rel = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
        log(f"{name}: rel_err {rel:.2e}")
        assert rel < 2e-5
        packs[name] = A

    for name, A in packs.items():
        def step(v, A=A):
            return gpr.spmv_gpr(A, v)

        dt = time_chained(step, x, iters=2000, warm=50)
        log(f"{name}: SpMV {dt * 1e6:.1f} us "
            f"({nnz / dt / 1e9:.2f} Gnnz/s)")

    # SpMM at the batched sweet spot
    X = jnp.asarray(rng.random((n, 4)).astype(np.float32))
    for name, A in packs.items():
        def stepm(V, A=A):
            return gpr.spmm_gpr(A, V)

        dt = time_chained(stepm, X, iters=500, warm=20)
        log(f"{name}: SpMM(4) {dt * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
