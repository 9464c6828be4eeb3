"""Distributed conjugate gradients over a device mesh.

The multi-chip version of :func:`tpu_spmv.solvers.cg`: the matrix is a
row-sharded :class:`~tpu_spmv.dist.sharded.ShardedCSR` / ``HaloCSR``,
vectors are :class:`~tpu_spmv.dist.sharded.ShardedVector`, the matvec is
the all-gather or halo-overlap SpMV, and every dot product reduces across
shards (the ``psum`` the reference's NUMA code structurally lacks —
SURVEY.md Q5).  The whole solve is one jitted SPMD program.

Requires a square matrix whose row partition equals its column partition
(so ``A @ x`` has the same sharding as ``x``); the builder enforces this
by using the row plan for the columns too.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..dist import blas
from ..dist.sharded import HaloCSR, NeighborCSR, ShardedCSR, ShardedVector
from ..dist.spmv import spmv_allgather, spmv_halo, spmv_neighbor

__all__ = ["DistCGResult", "dist_cg", "dist_cg_ca"]


class DistCGResult(NamedTuple):
    x: ShardedVector
    iterations: jax.Array
    residual_norm: jax.Array
    converged: jax.Array


def _dist_matvec(mesh, A, b: ShardedVector, axis: str, name: str):
    """Shared validation + matvec selection for the distributed Krylov
    solvers: square operator, b on the row plan, row partition == column
    partition, matvec = halo-overlap or all-gather SpMV."""
    if A.shape[0] != A.shape[1]:
        raise ValueError(f"{name} requires a square matrix")
    if A.row_starts != b.starts:
        raise ValueError(
            "b must be partitioned by the matrix row plan "
            "(build with ShardedVector.from_global(b, A.row_plan))"
        )
    if A.col_starts != A.row_starts:
        raise ValueError(
            f"{name} needs row partition == column partition; build the "
            "sharded matrix with square_plan=True"
        )
    if isinstance(A, NeighborCSR):
        return lambda v: spmv_neighbor(mesh, A, v, axis=axis)
    if isinstance(A, HaloCSR):
        return lambda v: spmv_halo(mesh, A, v, axis=axis)
    if isinstance(A, ShardedCSR):
        return lambda v: spmv_allgather(mesh, A, v, axis=axis)
    raise TypeError(f"unsupported sharded matrix {type(A).__name__}")


def dist_cg(mesh, A, b: ShardedVector, *, tol: float = 1e-8,
            maxiter: int = 500, axis: str = "x",
            precond=None) -> DistCGResult:
    """CG with a mesh-sharded matrix; ``A`` is ShardedCSR or HaloCSR.

    ``precond``: optional SPD ``M(r: ShardedVector) -> ShardedVector``
    (e.g. :func:`~tpu_spmv.solvers.dist_mg_preconditioner`) applied
    inside the jitted SPMD loop — the preconditioned residual dots
    reduce across shards exactly like the plain ones."""
    matvec = _dist_matvec(mesh, A, b, axis, "dist_cg")

    M = precond if precond is not None else (lambda r: r)

    @jax.jit
    def run(b):
        x0 = ShardedVector(chunks=jnp.zeros_like(b.chunks), starts=b.starts,
                           length=b.length)
        r0 = blas.axpby(1.0, b, -1.0, matvec(x0))
        z0 = M(r0)
        rz0 = blas.dot(r0, z0)
        rr0 = blas.dot(r0, r0)
        bnorm = jnp.sqrt(blas.dot(b, b))
        limit = tol * jnp.maximum(bnorm, 1e-300)

        def cond(state):
            x, r, p, rz, rr, it = state
            return (jnp.sqrt(rr) > limit) & (it < maxiter)

        def body(state):
            x, r, p, rz, rr, it = state
            Ap = matvec(p)
            pAp = blas.dot(p, Ap)
            alpha = rz / jnp.where(pAp == 0, jnp.ones_like(pAp), pAp)
            x = blas.axpy(alpha, p, x)
            r = blas.axpy(-alpha, Ap, r)
            z = M(r)
            rz_new = blas.dot(r, z)
            rr_new = blas.dot(r, r)
            p = blas.axpby(1.0, z,
                           rz_new / jnp.where(rz == 0,
                                              jnp.ones_like(rz), rz), p)
            return (x, r, p, rz_new, rr_new, it + 1)

        x, r, p, rz, rr, it = lax.while_loop(
            cond, body, (x0, r0, z0, rz0, rr0, 0))
        rnorm = jnp.sqrt(rr)
        return x, it, rnorm, rnorm <= limit

    x, it, rnorm, ok = run(b)
    return DistCGResult(x=x, iterations=it, residual_norm=rnorm, converged=ok)


def dist_cg_ca(mesh, A, b: ShardedVector, *, tol: float = 1e-8,
               maxiter: int = 500, axis: str = "x",
               precond=None) -> DistCGResult:
    """Communication-avoiding (single-reduction) distributed CG.

    The Chronopoulos–Gear recurrence: both CG scalars come from dots of
    quantities available TOGETHER at the top of the iteration —
    ``gamma = (r, u)`` and ``delta = (w, u)`` with ``u = M r``,
    ``w = A u`` — instead of :func:`dist_cg`'s data-dependent sequence
    (``pAp`` must finish before ``x,r`` update, only then ``rz, rr``).
    With the stopping dot ``(r, r)`` folded into the same
    :func:`~tpu_spmv.dist.blas.dot_stack`, each iteration issues exactly
    ONE ``all-reduce`` barrier (plus the matvec's collective) vs the
    classical loop's two — the win on any real pod where the psum
    latency rivals the local matvec.  ``alpha`` is recovered from the
    recurrence ``alpha = gamma / (delta − beta·gamma/alpha_prev)``;
    in exact arithmetic iterates match CG exactly (observed ±1
    iteration in floating point).

    Same contract as :func:`dist_cg` (SPD operator, optional SPD
    ``precond``)."""
    matvec = _dist_matvec(mesh, A, b, axis, "dist_cg_ca")
    M = precond if precond is not None else (lambda r: r)

    @jax.jit
    def run(b):
        dt = b.chunks.dtype
        x0 = ShardedVector(chunks=jnp.zeros_like(b.chunks),
                           starts=b.starts, length=b.length)
        r0 = b                               # x0 = 0 ⇒ r0 = b
        u0 = M(r0)
        w0 = matvec(u0)
        # ONE fused init reduction: gamma, delta, (r,r), (b,b)
        gamma0, delta0, rr0, bb = blas.dot_stack(
            (r0, u0), (w0, u0), (r0, r0), (b, b))
        limit = tol * jnp.maximum(jnp.sqrt(bb), 1e-300)
        alpha0 = gamma0 / jnp.where(delta0 == 0, jnp.ones_like(delta0),
                                    delta0)
        zero = blas.scale(b, 0.0)
        st0 = (x0, r0, u0, w0, zero, zero, gamma0, alpha0,
               jnp.zeros((), dt), rr0, 0)

        def cond(st):
            *_, rr, it = st
            return (jnp.sqrt(rr) > limit) & (it < maxiter)

        def body(st):
            x, r, u, w, p, s, gamma, alpha, beta, rr, it = st
            p = blas.axpby(1.0, u, beta, p)
            s = blas.axpby(1.0, w, beta, s)
            x = blas.axpy(alpha, p, x)
            r = blas.axpy(-alpha, s, r)
            u = M(r)
            w = matvec(u)
            gamma_new, delta, rr_new = blas.dot_stack(
                (r, u), (w, u), (r, r))     # the iteration's ONE barrier
            beta_new = gamma_new / jnp.where(gamma == 0,
                                             jnp.ones_like(gamma), gamma)
            denom = delta - beta_new * gamma_new / jnp.where(
                alpha == 0, jnp.ones_like(alpha), alpha)
            alpha_new = gamma_new / jnp.where(denom == 0,
                                              jnp.ones_like(denom), denom)
            return (x, r, u, w, p, s, gamma_new, alpha_new, beta_new,
                    rr_new, it + 1)

        x, r, *_, rr, it = lax.while_loop(cond, body, st0)
        rnorm = jnp.sqrt(rr)
        return x, it, rnorm, rnorm <= limit

    x, it, rnorm, ok = run(b)
    return DistCGResult(x=x, iterations=it, residual_norm=rnorm, converged=ok)
