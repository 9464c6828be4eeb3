"""BLAS-1 on sharded vectors.

Because :class:`~tpu_spmv.dist.sharded.ShardedVector` chunks are zero-padded,
elementwise ops and reductions over the stacked ``[ndev, C]`` array are exact
— under ``jit`` with a sharded layout XLA partitions the elementwise work per
device and inserts the ``psum`` for reductions automatically (the
cross-shard reduction the reference's NUMA CSC path forgot, SURVEY.md Q5).

Ops requiring aligned partitions (axpby of two vectors) assume both operands
share the same plan; :func:`check_aligned` enforces it.
"""

from __future__ import annotations

import jax.numpy as jnp

from .sharded import ShardedVector

__all__ = ["dot", "dot_stack", "axpby", "axpy", "scale", "norm2",
           "check_aligned"]


def check_aligned(x: ShardedVector, y: ShardedVector) -> None:
    if x.starts != y.starts or x.length != y.length:
        raise ValueError("sharded vectors have mismatched partitions")


def dot(x: ShardedVector, y: ShardedVector):
    check_aligned(x, y)
    return jnp.vdot(x.chunks, y.chunks)


def dot_stack(*pairs):
    """Fused multi-dot: ``[len(pairs)]`` array of ``x·y`` for several
    aligned pairs, reduced TOGETHER so SPMD partitioning inserts ONE
    ``all-reduce`` for the whole batch (separate :func:`dot` calls with
    data dependencies between them each pay their own barrier — the
    communication-avoiding solvers exist to amortize exactly this).
    All vectors must share one partition; real dtypes only."""
    for x, y in pairs:
        check_aligned(x, y)
    prods = jnp.stack([x.chunks * y.chunks for x, y in pairs])
    return prods.sum(axis=tuple(range(1, prods.ndim)))


def axpby(alpha, x: ShardedVector, beta, y: ShardedVector) -> ShardedVector:
    check_aligned(x, y)
    return ShardedVector(
        chunks=alpha * x.chunks + beta * y.chunks,
        starts=x.starts, length=x.length,
    )


def axpy(alpha, x: ShardedVector, y: ShardedVector) -> ShardedVector:
    check_aligned(x, y)
    return ShardedVector(
        chunks=y.chunks + alpha * x.chunks, starts=x.starts, length=x.length,
    )


def scale(x: ShardedVector, alpha) -> ShardedVector:
    return ShardedVector(chunks=alpha * x.chunks, starts=x.starts,
                         length=x.length)


def norm2(x: ShardedVector):
    return jnp.sqrt(jnp.vdot(x.chunks, x.chunks))
