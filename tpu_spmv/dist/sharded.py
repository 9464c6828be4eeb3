"""Sharded matrix/vector containers — the ``NumaNode4*`` structs, TPU-style.

Reference parity: `/root/reference/include/numa_node.h` defines per-thread
partition structs (``alloc`` node, ``start_row``/``rows_per_node``, private
sub-arrays, private replicated ``X``/``Y``); the setup code memcpy's slices
into ``numa_alloc_onnode`` buffers (`/root/reference/src/mat_vec.cpp:240-268`).

Here the same role is played by pytree dataclasses whose leaves are stacked
``[ndev, ...]`` arrays, laid out so that sharding axis 0 over a 1-D
``jax.sharding.Mesh`` places shard ``i``'s slice on device ``i`` — the
``NamedSharding`` is the ``numa_alloc_onnode`` analog, and ``shard_map``
bodies see exactly one shard (the pthread body analog,
`/root/reference/src/mat_vec.cpp:507-530`).

Two matrix layouts:

- :class:`ShardedCSR` — for the **all-gather** strategy: column indices are
  pre-remapped into *padded gathered-x space* (``owner*C + local``) so the
  local kernel can index the all-gathered ``[P*C]`` x directly.
- :class:`HaloCSR` — for the **overlapped ring** strategy: each shard's
  entries are bucketed by ring step (bucket ``t`` of shard ``s`` holds the
  entries whose x-chunk is owned by device ``(s-t) mod P``), with column
  indices remapped into the owner's local chunk space.  Bucket-major layout
  makes every ring step a static slice.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..formats.base import as_index_array, sparse_dataclass, static_field
from ..formats.csr import CSR
from .partition import RowPlan, plan_even, plan_rows

__all__ = ["ShardedVector", "ShardedCSR", "HaloCSR", "NeighborCSR",
           "ColShardedCSR"]


def _pad_to(arr: np.ndarray, size: int, fill=0) -> np.ndarray:
    out = np.full((size,) + arr.shape[1:], fill, dtype=arr.dtype)
    out[: len(arr)] = arr
    return out


def _csr_host_arrays(csr):
    """(indptr, indices, data, row_ids, shape, nnz) as HOST numpy from a
    tpu_spmv CSR **or** a scipy.sparse CSR.

    The builders below are host-numpy algorithms; accepting scipy lets
    callers (the distributed planner) avoid converting to a device CSR
    only to drag every leaf back through a ~1-2 MB/s tunnel."""
    indptr = np.asarray(csr.indptr, dtype=np.int64)
    indices = np.asarray(csr.indices, dtype=np.int64)
    data = np.asarray(csr.data)
    if hasattr(csr, "row_ids"):
        row_ids = np.asarray(csr.row_ids, dtype=np.int64)
    else:  # scipy csr
        row_ids = np.repeat(np.arange(len(indptr) - 1, dtype=np.int64),
                            np.diff(indptr))
    return indptr, indices, data, row_ids, tuple(csr.shape), int(indptr[-1])


@sparse_dataclass
class ShardedVector:
    """Dense vector split into ``ndev`` contiguous zero-padded chunks.

    The replicated-x / private-y buffers of the reference
    (`/root/reference/src/mat_vec.cpp:197,266`) become one ``[ndev, C]``
    array sharded over the mesh; padding is zero so reductions over the
    stacked array are exact.
    """

    chunks: jax.Array                      # [ndev, C]
    starts: tuple[int, ...] = static_field()
    length: int = static_field()

    @property
    def ndev(self) -> int:
        return int(self.chunks.shape[0])

    @property
    def chunk_size(self) -> int:
        return int(self.chunks.shape[1])

    @staticmethod
    def from_global(x, plan: RowPlan, dtype=None) -> "ShardedVector":
        """Split a global ``[length]`` (or ``[length, nrhs]`` — multi-RHS)
        array into padded per-shard chunks."""
        x = np.asarray(x)
        if x.shape[0] != plan.length:
            raise ValueError(f"x has shape {x.shape}, plan expects leading "
                             f"dim {plan.length}")
        C = max(plan.max_count, 1)
        chunks = np.zeros((plan.ndev, C) + x.shape[1:], dtype=dtype or x.dtype)
        s = plan.starts
        for i in range(plan.ndev):
            chunks[i, : s[i + 1] - s[i]] = x[s[i]: s[i + 1]]
        return ShardedVector(
            chunks=jnp.asarray(chunks), starts=plan.starts, length=plan.length
        )

    def to_global(self) -> np.ndarray:
        """Strip padding, concatenate chunks (host-side)."""
        chunks = np.asarray(self.chunks)
        s = self.starts
        return np.concatenate(
            [chunks[i, : s[i + 1] - s[i]] for i in range(self.ndev)]
        )


@sparse_dataclass
class ShardedCSR:
    """Row-partitioned CSR for the all-gather SpMV strategy.

    Leaves are ``[ndev, nnzp]`` stacked shards (nnz-padded uniform);
    ``cols`` index into *padded gathered-x space* (see module docstring).
    """

    data: jax.Array                        # [ndev, nnzp]
    cols: jax.Array                        # [ndev, nnzp] — padded-x-space ids
    rows: jax.Array                        # [ndev, nnzp] — local row ids
    shape: tuple[int, int] = static_field()
    row_starts: tuple[int, ...] = static_field()
    col_starts: tuple[int, ...] = static_field()
    nnz: int = static_field()

    @property
    def ndev(self) -> int:
        return int(self.data.shape[0])

    @property
    def rows_max(self) -> int:
        s = np.asarray(self.row_starts)
        return int((s[1:] - s[:-1]).max())

    @property
    def chunk_size(self) -> int:
        s = np.asarray(self.col_starts)
        return max(int((s[1:] - s[:-1]).max()), 1)

    @property
    def row_plan(self) -> RowPlan:
        return RowPlan(self.row_starts, self.ndev, self.shape[0])

    @property
    def col_plan(self) -> RowPlan:
        return RowPlan(self.col_starts, self.ndev, self.shape[1])

    @staticmethod
    def build(csr: CSR, ndev: int, *, balance: str = "nnz",
              square: bool = False) -> "ShardedCSR":
        """Partition a host CSR into ``ndev`` stacked shards.

        The reference's setup does the same job with per-thread nnz-range
        lookup + memcpy (`/root/reference/src/mat_vec.cpp:250-267`), minus
        the padding (threads tolerate ragged sizes; SPMD does not).

        ``square=True`` uses the row plan for the columns too (required by
        solvers that chain ``A @ x`` — output sharding == input sharding).
        """
        indptr, cols, data, row_ids, (nrow, ncol), _ = _csr_host_arrays(csr)
        rplan = plan_rows(indptr, ndev, balance=balance)
        if square:
            if nrow != ncol:
                raise ValueError("square=True requires a square matrix")
            cplan = rplan
        else:
            cplan = plan_even(ncol, ndev)
        C = max(cplan.max_count, 1)
        owner = cplan.owner_of(cols)
        # remap global col -> padded gathered-x space
        cstarts = np.asarray(cplan.starts)
        cols_padded = owner * C + (cols - cstarts[owner])
        s = rplan.starts
        nnz_per = indptr[list(s[1:])] - indptr[list(s[:-1])]
        nnzp = max(int(nnz_per.max()), 1)
        d_stack = np.zeros((ndev, nnzp), dtype=data.dtype)
        c_stack = np.zeros((ndev, nnzp), dtype=np.int64)
        r_stack = np.zeros((ndev, nnzp), dtype=np.int64)
        for i in range(ndev):
            lo, hi = indptr[s[i]], indptr[s[i + 1]]
            d_stack[i] = _pad_to(data[lo:hi], nnzp)
            c_stack[i] = _pad_to(cols_padded[lo:hi], nnzp)
            r_stack[i] = _pad_to(row_ids[lo:hi] - s[i], nnzp)
        return ShardedCSR(
            data=jnp.asarray(d_stack, dtype=csr.data.dtype),
            cols=as_index_array(c_stack),
            rows=as_index_array(r_stack),
            shape=csr.shape,
            row_starts=rplan.starts,
            col_starts=cplan.starts,
            nnz=csr.nnz,
        )

    def unpad_y(self, y_stacked) -> np.ndarray:
        """[ndev, R] padded result → global [nrow] (host-side)."""
        y = np.asarray(y_stacked)
        s = self.row_starts
        return np.concatenate(
            [y[i, : s[i + 1] - s[i]] for i in range(self.ndev)]
        )


@sparse_dataclass
class HaloCSR:
    """Row-partitioned CSR bucketed by ring step for overlapped halo SpMV.

    ``data/cols/rows`` are ``[ndev, ndev, nnzb]``: axis 0 = shard, axis 1 =
    ring step ``t`` (entries whose x-chunk owner is ``(shard - t) mod P``),
    axis 2 = nnz padded to the max bucket size.  ``cols`` index into the
    owner's local ``[C]`` chunk.

    This is the data layout that lets compute on the current x chunk overlap
    the ``ppermute`` bringing the next one — the ≥80% weak-scaling recipe
    (SURVEY.md §7 "Halo/remote-x overlap"), with no reference counterpart.
    """

    data: jax.Array                        # [ndev, ndev, nnzb]
    cols: jax.Array                        # [ndev, ndev, nnzb] — owner-chunk ids
    rows: jax.Array                        # [ndev, ndev, nnzb] — local row ids
    shape: tuple[int, int] = static_field()
    row_starts: tuple[int, ...] = static_field()
    col_starts: tuple[int, ...] = static_field()
    nnz: int = static_field()

    @property
    def ndev(self) -> int:
        return int(self.data.shape[0])

    @property
    def rows_max(self) -> int:
        s = np.asarray(self.row_starts)
        return int((s[1:] - s[:-1]).max())

    @property
    def row_plan(self) -> RowPlan:
        return RowPlan(self.row_starts, self.ndev, self.shape[0])

    @property
    def col_plan(self) -> RowPlan:
        return RowPlan(self.col_starts, self.ndev, self.shape[1])

    @staticmethod
    def build(csr: CSR, ndev: int, *, balance: str = "nnz",
              square: bool = False) -> "HaloCSR":
        indptr, cols, data, row_ids, (nrow, ncol), _ = _csr_host_arrays(csr)
        rplan = plan_rows(indptr, ndev, balance=balance)
        if square:
            if nrow != ncol:
                raise ValueError("square=True requires a square matrix")
            cplan = rplan
        else:
            cplan = plan_even(ncol, ndev)
        cstarts = np.asarray(cplan.starts)
        owner = cplan.owner_of(cols)
        cols_local = cols - cstarts[owner]
        shard = rplan.owner_of(row_ids)
        step = (shard - owner) % ndev
        rows_local = row_ids - np.asarray(rplan.starts)[shard]
        # bucket sizes [ndev, ndev]
        bucket_key = shard * ndev + step
        sizes = np.bincount(bucket_key, minlength=ndev * ndev)
        nnzb = max(int(sizes.max()), 1)
        d = np.zeros((ndev, ndev, nnzb), dtype=data.dtype)
        c = np.zeros((ndev, ndev, nnzb), dtype=np.int64)
        r = np.zeros((ndev, ndev, nnzb), dtype=np.int64)
        order = np.argsort(bucket_key, kind="stable")
        # slot of each entry within its bucket
        key_sorted = bucket_key[order]
        starts = np.zeros(ndev * ndev + 1, dtype=np.int64)
        np.cumsum(sizes, out=starts[1:])
        slot = np.arange(len(order)) - starts[key_sorted]
        sh, st = key_sorted // ndev, key_sorted % ndev
        d[sh, st, slot] = data[order]
        c[sh, st, slot] = cols_local[order]
        r[sh, st, slot] = rows_local[order]
        return HaloCSR(
            data=jnp.asarray(d, dtype=csr.data.dtype),
            cols=as_index_array(c),
            rows=as_index_array(r),
            shape=csr.shape,
            row_starts=rplan.starts,
            col_starts=cplan.starts,
            nnz=csr.nnz,
        )

    def unpad_y(self, y_stacked) -> np.ndarray:
        y = np.asarray(y_stacked)
        s = self.row_starts
        return np.concatenate(
            [y[i, : s[i + 1] - s[i]] for i in range(self.ndev)]
        )


@sparse_dataclass
class NeighborCSR:
    """Row-partitioned CSR with NEIGHBOR halo exchange — the halo
    strategy done right for graph-local patterns.

    The ring :class:`HaloCSR` rotates x all the way around the mesh:
    ``ndev`` steps, EACH padded to the largest bucket.  On a banded
    operator the self bucket holds most of the local nnz, so the padded
    ring does ~``ndev × max_bucket`` gather work — measured 6.6x the
    all-gather strategy at ndev=8 (``DIST_r04.json``), entirely
    work-inflation, not communication.  This container instead ships
    ONLY the ``k`` neighbor chunks any shard's columns actually touch
    (the STATIC union of ring offsets across shards — 2 for a banded
    operator, a handful for meshes/graphs with locality) and computes in
    two padded buckets:

    - **interior** entries (columns in the local chunk) — computed while
      the ``ppermute`` transfers fly (the overlapped-halo recipe,
      BASELINE config 5);
    - **boundary** entries, gathered from the halo window
      ``[halo_0 | halo_1 | …]`` once the transfers land.

    Total padded gather work ≈ the all-gather strategy's (one pass over
    the shard's nnz, split into two buckets), while per-shard traffic
    drops from ``(ndev−1)·C`` to ``k·C`` values.  Patterns whose offset
    union approaches ``ndev`` (all-to-all column access) gain nothing —
    :func:`~tpu_spmv.dist.planned.predict_dist_costs` models the
    crossover and the planner picks accordingly.
    """

    data_int: jax.Array                    # [ndev, nnzi]
    cols_int: jax.Array                    # [ndev, nnzi] — local-chunk ids
    rows_int: jax.Array                    # [ndev, nnzi] — local row ids
    data_bnd: jax.Array                    # [ndev, nnzb]
    cols_bnd: jax.Array                    # [ndev, nnzb] — halo-window ids
    rows_bnd: jax.Array                    # [ndev, nnzb] — local row ids
    offsets: tuple[int, ...] = static_field()   # ring deltas, != 0
    shape: tuple[int, int] = static_field()
    row_starts: tuple[int, ...] = static_field()
    col_starts: tuple[int, ...] = static_field()
    nnz: int = static_field()

    @property
    def ndev(self) -> int:
        return int(self.data_int.shape[0])

    @property
    def rows_max(self) -> int:
        s = np.asarray(self.row_starts)
        return int((s[1:] - s[:-1]).max())

    @property
    def chunk_size(self) -> int:
        s = np.asarray(self.col_starts)
        return max(int((s[1:] - s[:-1]).max()), 1)

    @property
    def row_plan(self) -> RowPlan:
        return RowPlan(self.row_starts, self.ndev, self.shape[0])

    @property
    def col_plan(self) -> RowPlan:
        return RowPlan(self.col_starts, self.ndev, self.shape[1])

    @staticmethod
    def build(csr: CSR, ndev: int, *, balance: str = "nnz",
              square: bool = False) -> "NeighborCSR":
        indptr, cols, data, row_ids, (nrow, ncol), _ = _csr_host_arrays(csr)
        rplan = plan_rows(indptr, ndev, balance=balance)
        if square:
            if nrow != ncol:
                raise ValueError("square=True requires a square matrix")
            cplan = rplan
        else:
            cplan = plan_even(ncol, ndev)
        cstarts = np.asarray(cplan.starts)
        owner = cplan.owner_of(cols)
        cols_local = cols - cstarts[owner]
        shard = rplan.owner_of(row_ids)
        rows_local = row_ids - np.asarray(rplan.starts)[shard]
        delta = (owner - shard) % ndev                 # 0 = interior
        # static union of nonzero deltas across ALL shards (every shard
        # runs the same SPMD program, so the halo set is global)
        offs = tuple(int(d) for d in np.unique(delta) if d != 0)
        hidx = np.zeros(ndev, dtype=np.int64)          # delta -> window slot
        for i, d in enumerate(offs):
            hidx[d] = i
        C = max(cplan.max_count, 1)

        def bucket(mask, window_cols):
            sizes = np.bincount(shard[mask], minlength=ndev)
            nb = max(int(sizes.max()), 1)
            dd = np.zeros((ndev, nb), dtype=data.dtype)
            cc = np.zeros((ndev, nb), dtype=np.int64)
            rr = np.zeros((ndev, nb), dtype=np.int64)
            order = np.argsort(shard[mask], kind="stable")
            sh_sorted = shard[mask][order]
            starts = np.zeros(ndev + 1, dtype=np.int64)
            np.cumsum(sizes, out=starts[1:])
            slot = np.arange(len(order)) - starts[sh_sorted]
            dd[sh_sorted, slot] = data[mask][order]
            cc[sh_sorted, slot] = window_cols[mask][order]
            rr[sh_sorted, slot] = rows_local[mask][order]
            return dd, cc, rr

        interior = delta == 0
        di, ci, ri = bucket(interior, cols_local)
        db, cb, rb = bucket(~interior, hidx[delta] * C + cols_local)
        return NeighborCSR(
            data_int=jnp.asarray(di, dtype=csr.data.dtype),
            cols_int=as_index_array(ci),
            rows_int=as_index_array(ri),
            data_bnd=jnp.asarray(db, dtype=csr.data.dtype),
            cols_bnd=as_index_array(cb),
            rows_bnd=as_index_array(rb),
            offsets=offs,
            shape=csr.shape,
            row_starts=rplan.starts,
            col_starts=cplan.starts,
            nnz=csr.nnz,
        )

    def unpad_y(self, y_stacked) -> np.ndarray:
        y = np.asarray(y_stacked)
        s = self.row_starts
        return np.concatenate(
            [y[i, : s[i + 1] - s[i]] for i in range(self.ndev)]
        )


@sparse_dataclass
class ColShardedCSR:
    """COLUMN-partitioned matrix for the reduce-scatter SpMV strategy.

    The reference's CSC NUMA path gives each thread a column slab and a
    full-length private Y — and never reduces across threads (SURVEY.md
    Q5, `/root/reference/src/mat_vec.cpp:327`).  This container is that
    strategy done right: shard ``s`` owns columns ``[cs, cs+1)`` (and only
    its slice of x, like the reference's CSC x copy,
    `/root/reference/src/mat_vec.cpp:335`), computes a full-length partial
    y, and the missing cross-shard reduction is an explicit
    ``lax.psum_scatter`` that simultaneously hands each shard its owned y
    rows.

    Leaves are ``[ndev, nnzp]``: values, LOCAL column ids (into the owned
    x chunk), GLOBAL row ids (into the padded ``[ndev*R]`` y).  Row
    ownership is uniform (``plan_uniform``) so the tiled reduce-scatter
    splits y evenly.
    """

    data: jax.Array                        # [ndev, nnzp]
    cols: jax.Array                        # [ndev, nnzp] — local col ids
    rows: jax.Array                        # [ndev, nnzp] — global row ids
    shape: tuple[int, int] = static_field()
    row_starts: tuple[int, ...] = static_field()
    col_starts: tuple[int, ...] = static_field()
    nnz: int = static_field()

    @property
    def ndev(self) -> int:
        return int(self.data.shape[0])

    @property
    def rows_per_shard(self) -> int:
        # uniform by construction: every shard's padded slice is R rows
        return max(int(-(-self.shape[0] // self.ndev)), 1)

    @property
    def row_plan(self) -> RowPlan:
        return RowPlan(self.row_starts, self.ndev, self.shape[0])

    @property
    def col_plan(self) -> RowPlan:
        return RowPlan(self.col_starts, self.ndev, self.shape[1])

    @staticmethod
    def build(csr: CSR, ndev: int, *, balance: str = "nnz"
              ) -> "ColShardedCSR":
        """Partition by columns; ``balance="nnz"`` places column
        boundaries at equal nnz quantiles (via the CSC column pointer),
        ``"cols"`` splits evenly."""
        from .partition import plan_uniform

        _, cols, data, row_ids, (nrow, ncol), _ = _csr_host_arrays(csr)
        if balance == "nnz":
            col_ptr = np.zeros(ncol + 1, dtype=np.int64)
            np.cumsum(np.bincount(cols, minlength=ncol), out=col_ptr[1:])
            cplan = plan_rows(col_ptr, ndev, balance="nnz")
        else:
            cplan = plan_even(ncol, ndev)
        rplan = plan_uniform(nrow, ndev)
        cstarts = np.asarray(cplan.starts)
        owner = cplan.owner_of(cols)
        cols_local = cols - cstarts[owner]
        order = np.argsort(owner, kind="stable")
        sizes = np.bincount(owner, minlength=ndev)
        nnzp = max(int(sizes.max()), 1)
        d = np.zeros((ndev, nnzp), dtype=data.dtype)
        c = np.zeros((ndev, nnzp), dtype=np.int64)
        r = np.zeros((ndev, nnzp), dtype=np.int64)
        starts = np.zeros(ndev + 1, dtype=np.int64)
        np.cumsum(sizes, out=starts[1:])
        slot = np.arange(len(order)) - starts[owner[order]]
        d[owner[order], slot] = data[order]
        c[owner[order], slot] = cols_local[order]
        r[owner[order], slot] = row_ids[order]
        return ColShardedCSR(
            data=jnp.asarray(d, dtype=csr.data.dtype),
            cols=as_index_array(c),
            rows=as_index_array(r),
            shape=csr.shape,
            row_starts=rplan.starts,
            col_starts=cplan.starts,
            nnz=csr.nnz,
        )

    def unpad_y(self, y_stacked) -> np.ndarray:
        y = np.asarray(y_stacked)
        s = self.row_starts
        return np.concatenate(
            [y[i, : s[i + 1] - s[i]] for i in range(self.ndev)]
        )
