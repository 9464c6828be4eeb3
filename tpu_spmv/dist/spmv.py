"""Distributed SpMV over a device mesh — the NUMA/pthread layer, SPMD-style.

Reference parity: the five ``*MatrixMatVectorNuma`` launchers
(`/root/reference/src/mat_vec.cpp:148-470`) which partition, place, spawn
pinned pthreads, and join.  The TPU equivalents are ``shard_map`` SPMD
programs over a 1-D ``jax.sharding.Mesh``:

- **replication of x** (the reference's per-thread ``memcpy`` of the full
  vector, `/root/reference/src/mat_vec.cpp:266`) → ``lax.all_gather`` over
  ICI (:func:`spmv_allgather`);
- **overlapped halo exchange** (no reference counterpart; the ≥80%
  weak-scaling recipe) → a ``ppermute`` ring where each step's x-chunk
  transfer overlaps the previous step's local compute
  (:func:`spmv_halo`);
- **the missing y-reduction** of the reference's CSC NUMA path (SURVEY.md
  Q5) is structurally impossible here: row results live exactly on their
  owner shard, and any cross-shard contribution goes through an explicit
  collective.

Both kernels take and return stacked ``[ndev, ...]`` containers
(:class:`~tpu_spmv.dist.sharded.ShardedCSR` / ``ShardedVector``); under
``jit`` with a ``NamedSharding`` those stacks live shard-per-device, and
multi-host meshes work unchanged (``jax.distributed.initialize`` +
a global mesh — see ``tpu_spmv.dist.mesh``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from .sharded import (ColShardedCSR, HaloCSR, NeighborCSR, ShardedCSR,
                      ShardedVector)

__all__ = ["spmv_allgather", "spmv_halo", "spmv_neighbor", "spmv_colsplit",
           "spmm_allgather", "spmm_halo", "spmm_neighbor", "place",
           "sharded_spec"]


def sharded_spec(axis: str = "x") -> P:
    """PartitionSpec sharding the leading (device) axis of stacked leaves."""
    return P(axis)


def place(obj, mesh: Mesh, axis: str = "x"):
    """Place a stacked container shard-per-device (the ``numa_alloc_onnode``
    analog, `/root/reference/src/mat_vec.cpp:188-192`)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), obj)


def _segment_sum(prod, rows, num_rows):
    return jax.ops.segment_sum(prod, rows, num_segments=num_rows,
                               indices_are_sorted=True)


def spmv_allgather(mesh: Mesh, A: ShardedCSR, x: ShardedVector,
                   *, axis: str = "x") -> ShardedVector:
    """Row-sharded SpMV with x replicated via all-gather.

    The direct upgrade of the reference's NUMA strategy: every shard gets
    the full x (all-gather over ICI instead of host memcpy), computes its
    row block locally, and keeps its y slice — no reduction needed.
    """
    R = A.rows_max

    @functools.partial(
        _shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )
    def run(A_loc: ShardedCSR, x_loc: ShardedVector):
        xg = lax.all_gather(x_loc.chunks[0], axis, tiled=True)  # [P*C]
        prod = A_loc.data[0] * xg[A_loc.cols[0]]
        y = _segment_sum(prod, A_loc.rows[0], R)
        return y[None]

    y = run(A, x)
    return ShardedVector(chunks=y, starts=A.row_starts, length=A.shape[0])


def spmv_halo(mesh: Mesh, A: HaloCSR, x: ShardedVector,
              *, axis: str = "x") -> ShardedVector:
    """Row-sharded SpMV with ring halo exchange overlapped with compute.

    Step ``t``: each shard multiplies the bucket of entries whose columns
    live in the x-chunk it currently holds, while ``ppermute`` ships that
    chunk to the next device.  The permute for step ``t+1`` is issued
    *before* step ``t``'s compute so XLA's latency-hiding scheduler can
    overlap DMA with the VPU work.  After P steps every shard has seen
    every chunk exactly once; x chunks are back home.

    Per-step traffic is one chunk (nc/P elements) instead of the
    all-gather's (P-1)·nc/P, and it rides concurrent ICI links.
    """
    R = A.rows_max
    ndev = A.ndev
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]

    @functools.partial(
        _shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )
    def run(A_loc: HaloCSR, x_loc: ShardedVector):
        data, cols, rows = A_loc.data[0], A_loc.cols[0], A_loc.rows[0]
        x_cur = x_loc.chunks[0]                       # chunk of (me - t) at step t
        y = jnp.zeros((R,), dtype=jnp.result_type(data.dtype, x_cur.dtype))
        for t in range(ndev):
            if t + 1 < ndev:
                # issue the transfer first → overlaps the compute below
                x_next = lax.ppermute(x_cur, axis, perm)
            prod = data[t] * x_cur[cols[t]]
            y = y + _segment_sum(prod, rows[t], R)
            if t + 1 < ndev:
                x_cur = x_next
        return y[None]

    y = run(A, x)
    return ShardedVector(chunks=y, starts=A.row_starts, length=A.shape[0])


def spmv_neighbor(mesh: Mesh, A: NeighborCSR, x: ShardedVector,
                  *, axis: str = "x") -> ShardedVector:
    """Row-sharded SpMV with NEIGHBOR halo exchange.

    Ships only the ``k = len(A.offsets)`` chunks any shard's columns
    touch (one ``ppermute`` per static ring offset, all issued before
    the interior compute so the transfers overlap it), then one gather +
    segment-sum over the boundary bucket against the landed halo window.
    Per-shard traffic ``k·C`` values vs the all-gather's ``(P−1)·C``;
    padded gather work ~the all-gather strategy's (the ring
    :func:`spmv_halo`'s ``P × max_bucket`` inflation is gone — see
    :class:`~tpu_spmv.dist.sharded.NeighborCSR`)."""
    R = A.rows_max
    ndev = A.ndev
    offs = A.offsets

    @functools.partial(
        _shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )
    def run(A_loc: NeighborCSR, x_loc: ShardedVector):
        xc = x_loc.chunks[0]                          # [C]
        # issue ALL halo transfers first → they overlap the interior
        # segment-sum below (XLA's latency-hiding scheduler)
        halos = [
            lax.ppermute(xc, axis,
                         [((i + d) % ndev, i) for i in range(ndev)])
            for d in offs
        ]
        prod = A_loc.data_int[0] * xc[A_loc.cols_int[0]]
        y = _segment_sum(prod, A_loc.rows_int[0], R)
        if halos:
            xwin = jnp.concatenate(halos)
            prod_b = A_loc.data_bnd[0] * xwin[A_loc.cols_bnd[0]]
            y = y + _segment_sum(prod_b, A_loc.rows_bnd[0], R)
        return y[None]

    y = run(A, x)
    return ShardedVector(chunks=y, starts=A.row_starts, length=A.shape[0])


def spmm_neighbor(mesh: Mesh, A: NeighborCSR, X: ShardedVector,
                  *, axis: str = "x") -> ShardedVector:
    """Row-sharded SpMM with neighbor halo exchange (multi-RHS):
    ``X.chunks`` is ``[ndev, C, nrhs]``."""
    R = A.rows_max
    ndev = A.ndev
    offs = A.offsets

    @functools.partial(
        _shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )
    def run(A_loc: NeighborCSR, X_loc: ShardedVector):
        xc = X_loc.chunks[0]                          # [C, nrhs]
        halos = [
            lax.ppermute(xc, axis,
                         [((i + d) % ndev, i) for i in range(ndev)])
            for d in offs
        ]
        prod = A_loc.data_int[0][:, None] * xc[A_loc.cols_int[0]]
        y = _segment_sum(prod, A_loc.rows_int[0], R)
        if halos:
            xwin = jnp.concatenate(halos)
            prod_b = A_loc.data_bnd[0][:, None] * xwin[A_loc.cols_bnd[0]]
            y = y + _segment_sum(prod_b, A_loc.rows_bnd[0], R)
        return y[None]

    y = run(A, X)
    return ShardedVector(chunks=y, starts=A.row_starts, length=A.shape[0])


def spmv_colsplit(mesh: Mesh, A: ColShardedCSR, x: ShardedVector,
                  *, axis: str = "x") -> ShardedVector:
    """COLUMN-partitioned SpMV with an explicit reduce-scatter of y.

    The TPU-correct version of the reference's CSC NUMA strategy: each
    shard keeps only its x slice (zero comm on the way in — the x
    replication cost of the row strategies disappears), computes a
    full-length partial y from its column slab, and ``lax.psum_scatter``
    performs the cross-shard reduction the reference forgot (SURVEY.md
    Q5) while scattering ownership: shard ``s`` receives exactly its
    ``[s*R, (s+1)*R)`` y rows.  One collective, (P-1)/P · nrow elements
    per device — the exact dual of the all-gather strategy's x traffic.
    """
    R = A.rows_per_shard
    ndev = A.ndev

    @functools.partial(
        _shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )
    def run(A_loc: ColShardedCSR, x_loc: ShardedVector):
        prod = A_loc.data[0] * x_loc.chunks[0][A_loc.cols[0]]
        part = _segment_sum(prod, A_loc.rows[0], ndev * R)   # padded [P*R]
        y = lax.psum_scatter(part, axis, scatter_dimension=0, tiled=True)
        return y[None]

    y = run(A, x)
    return ShardedVector(chunks=y, starts=A.row_starts, length=A.shape[0])


def spmm_allgather(mesh: Mesh, A: ShardedCSR, X: ShardedVector,
                   *, axis: str = "x") -> ShardedVector:
    """Row-sharded SpMM (multi-RHS): ``X.chunks`` is ``[ndev, C, nrhs]``.

    Same strategy as :func:`spmv_allgather`; the RHS block rides along the
    trailing axis of the all-gather and the segment reduction.
    """
    R = A.rows_max

    @functools.partial(
        _shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )
    def run(A_loc: ShardedCSR, X_loc: ShardedVector):
        xg = lax.all_gather(X_loc.chunks[0], axis, tiled=True)  # [P*C, nrhs]
        prod = A_loc.data[0][:, None] * xg[A_loc.cols[0]]
        y = _segment_sum(prod, A_loc.rows[0], R)
        return y[None]

    y = run(A, X)
    return ShardedVector(chunks=y, starts=A.row_starts, length=A.shape[0])


def spmm_halo(mesh: Mesh, A: HaloCSR, X: ShardedVector,
              *, axis: str = "x") -> ShardedVector:
    """Row-sharded SpMM with overlapped ring halo exchange (multi-RHS)."""
    R = A.rows_max
    ndev = A.ndev
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]

    @functools.partial(
        _shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )
    def run(A_loc: HaloCSR, X_loc: ShardedVector):
        data, cols, rows = A_loc.data[0], A_loc.cols[0], A_loc.rows[0]
        x_cur = X_loc.chunks[0]                       # [C, nrhs]
        nrhs = x_cur.shape[-1]
        y = jnp.zeros((R, nrhs),
                      dtype=jnp.result_type(data.dtype, x_cur.dtype))
        for t in range(ndev):
            if t + 1 < ndev:
                x_next = lax.ppermute(x_cur, axis, perm)
            prod = data[t][:, None] * x_cur[cols[t]]
            y = y + _segment_sum(prod, rows[t], R)
            if t + 1 < ndev:
                x_cur = x_next
        return y[None]

    y = run(A, X)
    return ShardedVector(chunks=y, starts=A.row_starts, length=A.shape[0])
