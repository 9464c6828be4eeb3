"""Confirm the ~20 ms per-CALL overhead hypothesis: intercept/slope of
fixed-k runner calls, pure dispatch cost, and the same run with all
result post-processing inside ONE jit + one readback.
"""
import sys
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import bench as B
from tpu_spmv.ops.spmv import spmv
from tpu_spmv.solvers import cg_runner, mg_preconditioner


def log(*a):
    print(*a, flush=True)


g = 1024
n = g * g
A = B.build_poisson_dia_device(g, jnp.float32)
b = jax.random.uniform(jax.random.PRNGKey(3), (n,), jnp.float32)

# pure dispatch+readback floor
@jax.jit
def triv(v):
    return jnp.sum(v)

float(triv(b))
best = 1e9
for _ in range(5):
    t0 = time.time(); float(triv(b)); best = min(best, time.time() - t0)
log(f"trivial jit call+readback: {best*1e3:6.2f} ms")


def timeit(fn):
    fn()
    best = 1e9
    for _ in range(3):
        t0 = time.time(); fn(); best = min(best, time.time() - t0)
    return best


mg = mg_preconditioner((g, g))
for k in (15, 60):
    r = cg_runner(A, iters=k, tol=None)
    dt = timeit(lambda: float(r(b).residual_norm))
    log(f"runner plain k={k:3d}: {dt*1e3:7.2f} ms")
for k in (15, 60):
    r = cg_runner(A, iters=k, tol=None, precond=mg)
    dt = timeit(lambda: float(r(b).residual_norm))
    log(f"runner mgpcg k={k:3d}: {dt*1e3:7.2f} ms")


# all-in-one-jit variant: same CG, zero host-side device ops, ONE readback
def onejit_fixed(k, M=None):
    Mfn = M if M is not None else (lambda r: r)

    @jax.jit
    def run(bv):
        x0 = jnp.zeros_like(bv)
        r0 = bv
        z0 = Mfn(r0)
        rz0 = jnp.vdot(r0, z0)

        def body(_, st):
            x, r, p, rz = st
            Ap = spmv(A, p)
            pAp = jnp.vdot(p, Ap)
            alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
            x = x + alpha * p
            r = r - alpha * Ap
            z = Mfn(r)
            rz_new = jnp.vdot(r, z)
            p = z + (rz_new / jnp.where(rz == 0, 1.0, rz)) * p
            return (x, r, p, rz_new)

        x, r, p, rz = lax.fori_loop(0, k, body, (x0, r0, z0, rz0))
        return jnp.sqrt(jnp.vdot(r, r))

    return run


for k in (15, 60):
    run = onejit_fixed(k)
    dt = timeit(lambda: float(run(b)))
    log(f"onejit plain k={k:3d}: {dt*1e3:7.2f} ms")
for k in (15, 60):
    run = onejit_fixed(k, mg)
    dt = timeit(lambda: float(run(b)))
    log(f"onejit mgpcg k={k:3d}: {dt*1e3:7.2f} ms")
