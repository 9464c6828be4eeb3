"""Stage-level on-chip profile of the batched GPR SpMM (VERDICT #5).

Times cumulative prefixes of the batched pipeline on one qb-group so the
per-stage cost is the difference:  stage1 | stage1+s23 | full main.
Each prefix is made shape-preserving by projecting the stage output back
to the input shape (slice+reshape; adds one small copy, same for all).
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
t0 = time.time()
A = gpr.pack_gpr(sp.tocsr(), dtype=np.float32)
log(f"pack {sp.nnz} nnz {time.time()-t0:.1f}s fused={A.fused} v3={A.fused_v3}")
plan = A.plan
rp128 = plan.real_per_tile // 128
T = plan.ntiles
S = -(-n // 128)
log(f"T={T} rp128={rp128} S={S} nv={A.nv} side={A.side.nnz} "
    f"side_gpr={A.side_gpr is not None}")

rng = np.random.default_rng(3)
scale = np.float32(1.0 / abs(sp).sum(axis=1).max())

qb = 8
x3 = jnp.asarray(rng.random((qb, S, 128)), jnp.float32)
npix = S * 128


def proj(out, like):
    # project arbitrary-sized stage output back to x3 shape (dependency)
    flat = out.reshape(qb, -1)
    need = npix
    if flat.shape[1] < need:
        flat = jnp.pad(flat, ((0, 0), (0, need - flat.shape[1])))
    return flat[:, :need].reshape(qb, S, 128) * scale


def p_stage1(c, M):
    z = gpr._spmm_stage1(M, c)
    return proj(z, c)


def p_s23(c, M):
    z = gpr._spmm_stage1(M, c)
    P = gpr._run_s23_reduce_fused_batched(
        M, z.reshape(qb, T * 128, 128))
    return proj(P, c)


def p_main(c, M):
    z = gpr._spmm_stage1(M, c)
    P = gpr._run_s23_reduce_fused_batched(
        M, z.reshape(qb, T * 128, 128))
    y = gpr._spmm_reduce_restore(M, P.reshape(qb, T * rp128, 16))
    return proj(y, c)


def p_proj_only(c, M):
    return proj(c.reshape(qb, -1), c)


for name, fn in [("proj-only", p_proj_only), ("stage1", p_stage1),
                 ("s1+s23", p_s23), ("main(8)", p_main)]:
    dt = time_chained(fn, x3, iters=50, warm=5, operands=(A,))
    log(f"{name:10s}: {dt*1e6:8.1f} us")

# full spmm at nrhs=32 (group-mapped) for reference
X = jnp.asarray(rng.random((n, 32)), jnp.float32)
dt = time_chained(lambda C, M: gpr.spmm_gpr(M, C) * scale, X,
                  iters=30, warm=3, operands=(A,))
log(f"spmm32 full: {dt*1e3:8.3f} ms")
