"""Distributed BiCGSTAB over a device mesh.

The multi-chip version of :func:`tpu_spmv.solvers.krylov.bicgstab` —
general (nonsymmetric) square systems with a row-sharded matrix, where
:func:`~tpu_spmv.solvers.dist_cg.dist_cg` requires SPD.  Same SPMD shape:
sharded matvec (all-gather or overlapped halo exchange), sharded BLAS-1
with automatic ``psum`` reductions, one jitted ``lax.while_loop``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..dist import blas
from ..dist.sharded import ShardedVector
from .dist_cg import _dist_matvec

__all__ = ["DistBiCGSTABResult", "dist_bicgstab"]


class DistBiCGSTABResult(NamedTuple):
    x: ShardedVector
    iterations: jax.Array
    residual_norm: jax.Array
    converged: jax.Array


def dist_bicgstab(mesh, A, b: ShardedVector, *, tol: float = 1e-8,
                  maxiter: int = 500, axis: str = "x",
                  precond=None) -> DistBiCGSTABResult:
    """BiCGSTAB with a mesh-sharded matrix (ShardedCSR or HaloCSR).

    ``precond``: optional ``M(v: ShardedVector) -> ShardedVector``
    applied on the right (``A M⁻¹``), exactly like the serial
    :func:`~tpu_spmv.solvers.krylov.bicgstab` — e.g. a sharded Jacobi
    scale or :func:`~tpu_spmv.solvers.dist_mg_preconditioner`."""
    matvec = _dist_matvec(mesh, A, b, axis, "dist_bicgstab")
    M = precond if precond is not None else (lambda v: v)

    @jax.jit
    def run(b):
        dt = b.chunks.dtype
        eps = jnp.finfo(dt).tiny
        x0 = ShardedVector(chunks=jnp.zeros_like(b.chunks),
                           starts=b.starts, length=b.length)
        r0 = blas.axpby(1.0, b, -1.0, matvec(x0))
        rhat = r0                          # fixed shadow residual
        zero = blas.scale(r0, 0.0)
        bnorm = jnp.sqrt(blas.dot(b, b))
        limit = tol * jnp.maximum(bnorm, 1e-300)
        one = jnp.ones((), dt)
        st0 = (x0, r0, zero, zero, one, one, one, 0, False)

        def cond(st):
            x, r, p, v, rho, alpha, omega, it, broke = st
            return ((jnp.sqrt(blas.dot(r, r)) > limit) & (it < maxiter)
                    & jnp.logical_not(broke))

        def body(st):
            x, r, p, v, rho, alpha, omega, it, _ = st
            rho_new = blas.dot(rhat, r)
            broke = jnp.abs(rho_new) <= eps
            beta = jnp.where(broke, 0,
                             (rho_new / jnp.where(broke, 1, rho))
                             * (alpha / omega))
            p = blas.axpby(1.0, r, beta, blas.axpy(-omega, v, p))
            ph = M(p)
            v = matvec(ph)
            denom = blas.dot(rhat, v)
            broke = broke | (jnp.abs(denom) <= eps)
            alpha = jnp.where(broke, 0,
                              rho_new / jnp.where(broke, 1, denom))
            s = blas.axpy(-alpha, v, r)
            sh = M(s)
            t = matvec(sh)
            tt = blas.dot(t, t)
            broke_o = tt <= eps
            omega_new = jnp.where(broke_o, 0,
                                  blas.dot(t, s) / jnp.where(broke_o, 1, tt))
            x = blas.axpy(omega_new, sh, blas.axpy(alpha, ph, x))
            r = blas.axpy(-omega_new, t, s)
            # exact solve mid-step (s == 0) is success, not breakdown
            done = jnp.sqrt(blas.dot(s, s)) <= limit
            x_done = blas.axpy(-omega_new, sh, x)  # keep only x + alpha ph
            x = ShardedVector(
                chunks=jnp.where(done, x_done.chunks, x.chunks),
                starts=x.starts, length=x.length)
            r = ShardedVector(chunks=jnp.where(done, s.chunks, r.chunks),
                              starts=r.starts, length=r.length)
            return (x, r, p, v, rho_new, alpha,
                    jnp.where(broke_o, 1, omega_new), it + 1,
                    (broke | broke_o) & jnp.logical_not(done))

        x, r, *_, it, broke = lax.while_loop(cond, body, st0)
        rnorm = jnp.sqrt(blas.dot(r, r))
        return x, it, rnorm, rnorm <= limit

    x, it, rnorm, ok = run(b)
    return DistBiCGSTABResult(x=x, iterations=it, residual_norm=rnorm,
                              converged=ok)
