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
from ..dist.sharded import HaloCSR, ShardedCSR, ShardedVector
from ..dist.spmv import spmv_allgather, spmv_halo

__all__ = ["DistCGResult", "dist_cg"]


class DistCGResult(NamedTuple):
    x: ShardedVector
    iterations: jax.Array
    residual_norm: jax.Array
    converged: jax.Array


def dist_cg(mesh, A, b: ShardedVector, *, tol: float = 1e-8,
            maxiter: int = 500, axis: str = "x",
            precond=None) -> DistCGResult:
    """CG with a mesh-sharded matrix; ``A`` is ShardedCSR or HaloCSR.

    ``precond``: optional SPD ``M(r: ShardedVector) -> ShardedVector``
    (e.g. :func:`~tpu_spmv.solvers.dist_mg_preconditioner`) applied
    inside the jitted SPMD loop — the preconditioned residual dots
    reduce across shards exactly like the plain ones."""
    if A.shape[0] != A.shape[1]:
        raise ValueError("dist_cg requires a square matrix")
    if A.row_starts != b.starts:
        raise ValueError(
            "b must be partitioned by the matrix row plan "
            "(build with ShardedVector.from_global(b, A.row_plan))"
        )
    if A.col_starts != A.row_starts:
        raise ValueError(
            "dist_cg needs row partition == column partition; build the "
            "sharded matrix with square_plan=True"
        )
    if isinstance(A, HaloCSR):
        matvec = lambda v: spmv_halo(mesh, A, v, axis=axis)
    elif isinstance(A, ShardedCSR):
        matvec = lambda v: spmv_allgather(mesh, A, v, axis=axis)
    else:
        raise TypeError(f"unsupported sharded matrix {type(A).__name__}")

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
