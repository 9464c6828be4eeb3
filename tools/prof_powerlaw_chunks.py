"""Power-law (5.2M nnz) chunk-size sweep: does the fuller-tile win at
smaller chunks carry over to heavy-tailed patterns, or do hub-split
side pipelines / chunk-count overheads eat it?
"""
import sys
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import time
import numpy as np
import jax
import jax.numpy as jnp

from tpu_spmv.bench.harness import time_chained
from tpu_spmv.kernels import gpr
from tpu_spmv.utils import power_law


def log(*a):
    print(*a, flush=True)


n = 400_000
sp = power_law(n, n, avg_nnz_per_row=13, alpha=1.5, seed=6,
               dtype=np.float32)
csr = sp.tocsr()
log(f"power-law nnz={sp.nnz}")
rng = np.random.default_rng(4)
x = jnp.asarray(rng.random(n), jnp.float32)
scale = np.float32(1.0 / max(float(np.abs(sp).sum(axis=1).max()), 1))
ref1 = sp.astype(np.float64) @ np.asarray(x, np.float64)

for cn in (250_000, 350_000, 500_000, 700_000):
    t0 = time.time()
    A = gpr.pack_gpr_chunked(csr, dtype=np.float32, chunk_nnz=cn)
    pt = time.time() - t0
    Ts = [c.plan.ntiles for c in A.chunks]
    rps = sorted({c.plan.real_per_tile // 128 for c in A.chunks})
    v3n = sum(c.fused_v3 for c in A.chunks)
    log(f"pl chunk{cn//1000}k: pack {pt:.1f}s nchunks={len(A.chunks)} "
        f"sumT={sum(Ts)} rp128={rps} v3 {v3n}/{len(A.chunks)} "
        f"fold={'y' if A.fold is not None else 'n'}")
    y = np.asarray(gpr.spmv_gpr_chunked(A, x))
    rel = float(np.max(np.abs(y - ref1)) / np.max(np.abs(ref1)))
    assert rel < 2e-5, rel
    dt1 = time_chained(lambda c, M: gpr.spmv_gpr_chunked(M, c) * scale, x,
                       iters=50, warm=5, operands=(A,))
    log(f"pl chunk{cn//1000}k: spmv {dt1*1e6:7.1f} us "
        f"({2*sp.nnz/dt1/1e9:5.1f} GFLOP/s)")
