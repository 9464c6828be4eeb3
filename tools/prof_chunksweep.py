"""Chunk-size sweep for GPR: fuller tiles at smaller chunks (the
exchange-row budget eases ~quadratically), vs per-chunk launch overhead.
Also sweeps the SpMM group size on the best chunking.
"""
import sys
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import time
import numpy as np
import jax
import jax.numpy as jnp

from tpu_spmv.bench.harness import time_chained
from tpu_spmv.kernels import gpr
from tpu_spmv.utils import random_sparse


def log(*a):
    print(*a, flush=True)


n = 100_000
sp = random_sparse(n, n, 7e-5, seed=2, dtype=np.float32)
csr = sp.tocsr()
rng = np.random.default_rng(3)
x = jnp.asarray(rng.random(n), jnp.float32)
X = jnp.asarray(rng.random((n, 32)), jnp.float32)
scale = np.float32(1.0 / abs(sp).sum(axis=1).max())
ref1 = sp.astype(np.float64) @ np.asarray(x, np.float64)
refM = sp.astype(np.float64) @ np.asarray(X, np.float64)


def check(y, ref):
    rel = float(np.max(np.abs(np.asarray(y, np.float64) - ref))
                / np.max(np.abs(ref)))
    assert rel < 2e-5, rel


packs = {}
for cn in (125_000, 175_000, 250_000, 350_000, 500_000):
    t0 = time.time()
    A = gpr.pack_gpr_chunked(csr, dtype=np.float32, chunk_nnz=cn)
    pt = time.time() - t0
    Ts = [c.plan.ntiles for c in A.chunks]
    rps = [c.plan.real_per_tile // 128 for c in A.chunks]
    v3s = [c.fused_v3 for c in A.chunks]
    log(f"chunk{cn//1000}k: pack {pt:.1f}s T={Ts} rp128={rps} "
        f"v3={all(v3s)}")
    packs[cn] = A
    check(gpr.spmv_gpr_chunked(A, x), ref1)
    check(gpr.spmm_gpr_chunked(A, X), refM)
    dt1 = time_chained(lambda c, M: gpr.spmv_gpr_chunked(M, c) * scale, x,
                       iters=100, warm=5, operands=(A,))
    dtM = time_chained(lambda C, M: gpr.spmm_gpr_chunked(M, C) * scale, X,
                       iters=30, warm=3, operands=(A,))
    log(f"chunk{cn//1000}k: spmv {dt1*1e6:6.1f} us | spmm32 {dtM*1e3:6.3f} ms")

# group-size sweep on the best chunking so far (use 250k pack)
A = packs[250_000]
for qb in (4, 5, 8, 16):
    gpr.SPMM_BATCH_MAX_NRHS = qb
    dtM = time_chained(lambda C, M: gpr.spmm_gpr_chunked(M, C) * scale, X,
                       iters=30, warm=3, operands=(A,))
    log(f"qb={qb:2d} (250k): spmm32 {dtM*1e3:6.3f} ms")
gpr.SPMM_BATCH_MAX_NRHS = 8
