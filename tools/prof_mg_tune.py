"""Re-sweep MG-PCG configs under the HONEST protocol (the old sweep's
'flat config space' was the 25 ms call floor talking).  2048^2 primary
(HBM-bound), 1024^2 secondary.
"""
import sys
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import time
import jax, jax.numpy as jnp

import bench as B
from tpu_spmv.solvers import cg_runner, mg_preconditioner


def log(*a):
    print(*a, flush=True)


def best_call(fn):
    fn(); best = 1e9
    for _ in range(3):
        t0 = time.time(); fn(); best = min(best, time.time() - t0)
    return best


def honest(A, bv, precond, cap=400):
    r0 = cg_runner(A, iters=cap, tol=1e-4, precond=precond)(bv)
    it = int(r0.iterations)
    if not bool(r0.converged):
        return it, None, float(r0.residual_norm / jnp.linalg.norm(bv))
    k0 = it
    k1 = 4 * it
    def fence(runner, v):
        r = runner(v)                  # ONE solve; fence both buffers
        return float(r.residual_norm + 0 * r.x[0])

    lo = cg_runner(A, iters=k0, tol=None, precond=precond)
    t_lo = best_call(lambda: fence(lo, bv))
    while True:
        hi = cg_runner(A, iters=k1, tol=None, precond=precond)
        t_hi = best_call(lambda: fence(hi, bv))
        sig = t_hi - t_lo
        if sig > max(0.25 * t_lo, 13e-3) or k1 >= 512 * it:
            break
        k1 *= 4
    per = sig / (k1 - k0)
    return it, per, float(r0.residual_norm / jnp.linalg.norm(bv))


for g in (2048, 1024):
    A = B.build_poisson_dia_device(g, jnp.float32)
    b = jax.random.uniform(jax.random.PRNGKey(5), (g * g,), jnp.float32)
    for tag, kw in [
        ("nu2 c8 d16 (cur)", dict(nu1=2, nu2=2, coarsest=8,
                                  coarse_degree=16)),
        ("nu1 c8 d16", dict(nu1=1, nu2=1, coarsest=8, coarse_degree=16)),
        ("nu2 c64 d48", dict(nu1=2, nu2=2, coarsest=64, coarse_degree=48)),
        ("nu1 c64 d48", dict(nu1=1, nu2=1, coarsest=64, coarse_degree=48)),
        ("nu1 c32 d24", dict(nu1=1, nu2=1, coarsest=32, coarse_degree=24)),
        ("nu2 om.9", dict(nu1=2, nu2=2, coarsest=8, coarse_degree=16,
                          omega=0.9)),
    ]:
        mg = mg_preconditioner((g, g), **kw)
        it, per, rel = honest(A, b, mg)
        if per is None:
            log(f"g={g} {tag:18s}: NOT CONVERGED it={it} rel={rel:.1e}")
        else:
            log(f"g={g} {tag:18s}: {it:3d} it x {per*1e6:7.1f} us = "
                f"{it*per*1e3:7.2f} ms (rel {rel:.1e})")
