"""Decompose the 1.78 ms/iter MG-PCG cost: V-cycle alone is 140 us and
the DIA matvec <= 244 us, so ~1.4 ms/iter is integration overhead.
Fixed-k runners isolate while-vs-fori, precond-mode structure, and the
preconditioner body itself.
"""
import sys
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import time
import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from tpu_spmv.bench.harness import time_chained
from tpu_spmv.ops.spmv import spmv
from tpu_spmv.solvers import cg_runner, mg_preconditioner


def log(*a):
    print(*a, flush=True)


g = 1024
n = g * g
A = B.build_poisson_dia_device(g, jnp.float32)
b = jax.random.uniform(jax.random.PRNGKey(3), (n,), jnp.float32)
sc = jnp.float32(0.1)

# raw DIA matvec, chained
dt = time_chained(lambda c, M: spmv(M, c) * sc, b, iters=50, warm=5,
                  operands=(A,))
log(f"dia spmv chained    : {dt*1e6:7.1f} us")

mg = mg_preconditioner((g, g))
dt = time_chained(lambda c: mg(c) * sc, b, iters=30, warm=3)
log(f"vcycle chained      : {dt*1e6:7.1f} us")

# spmv + vcycle together, chained (the per-iteration payload)
dt = time_chained(lambda c, M: mg(spmv(M, c)) * sc, b, iters=30, warm=3,
                  operands=(A,))
log(f"spmv+vcycle chained : {dt*1e6:7.1f} us")


def time_runner(runner, tag, iters):
    r0 = runner(b)
    float(r0.residual_norm)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        r = runner(b)
        float(r.residual_norm)
        best = min(best, time.time() - t0)
    log(f"{tag:22s}: {best*1e3:7.2f} ms total, "
        f"{best*1e3/iters:6.3f} ms/iter ({int(r0.iterations)} it)")


time_runner(cg_runner(A, iters=15, tol=None), "fixed15 plain", 15)
time_runner(cg_runner(A, iters=15, tol=None,
                      precond=lambda r: r), "fixed15 ident-precond", 15)
time_runner(cg_runner(A, iters=15, tol=None, precond=mg),
            "fixed15 mgpcg", 15)
time_runner(cg_runner(A, iters=200, tol=1e-4, precond=mg),
            "tol mgpcg (while)", 15)
time_runner(cg_runner(A, iters=1664, tol=1e-4), "tol plain (while)", 1664)
