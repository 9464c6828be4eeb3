"""Planner-chosen FAST local kernels inside ``shard_map``.

The reference's whole point is that the partitioned path runs the *same
fast kernel* per partition (the NUMA CSR thread body is the plain CSR loop,
`/root/reference/src/mat_vec.cpp:507-530`).  Round 1's distributed layer
instead ran every shard on the XLA segment-sum path — ~0.13 Gval/s, the
exact kernel the cost model calls catastrophic (docs/DESIGN.md).  This
module closes that gap: the distributed planner picks the same gather-free
formulations the single-chip planner does (DIA > BDIA), shards them by
row blocks, and runs the shifted-FMA local kernel inside ``shard_map``
with a **neighbor-halo ring** instead of a full all-gather.

Key layout decision: shards are *uniform* (``plan_uniform``) so that
``global index = shard * C + local`` — then every diagonal's x window is a
**static slice** of ``[left | own | right]`` neighbor chunks, and the local
kernel compiles to exactly the single-chip DIA/BDIA code on a 3C-long x.
Per-step traffic is 2 chunks over ICI (vs the all-gather's P-1), and both
``ppermute`` transfers are issued before any FLOPs so XLA overlaps them
with compute.

Wrap-around garbage at ring edges is harmless by construction: DIA/BDIA
``data`` is zero wherever the diagonal leaves the matrix, so the wrapped
x values multiply zero.

General patterns run :class:`ShardedGPR` (below): each shard packs its
own GPR pipeline against the FULL column space (the all-gathered x), with
per-shard pack shapes reconciled by padding the per-shard tile counts to
the max — the uniform-shape requirement SPMD imposes.  Patterns that
cannot pack (or exceed the per-shard envelope) fall back to the
``HaloCSR``/segment-sum path in :mod:`tpu_spmv.dist.spmv`.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..formats.base import sparse_dataclass, static_field
from ..formats.dia import DIA
from ..formats.bdia import BDIA
from .partition import RowPlan, plan_even, plan_rows, plan_uniform
from .sharded import HaloCSR, NeighborCSR, ShardedCSR, ShardedVector

__all__ = ["ShardedDIA", "ShardedBDIA", "ShardedSDIA", "ShardedPSDIA",
           "ShardedGPR",
           "spmv_dia_sharded", "spmv_bdia_sharded", "spmv_sdia_sharded",
           "spmv_psdia_sharded", "spmv_gpr_sharded",
           "DistPlan", "plan_dist_spmv", "bench_dist_spmv",
           "predict_dist_costs"]


@sparse_dataclass
class ShardedDIA:
    """Row-uniform-sharded DIA: shard ``s`` owns global rows
    ``[s*R, (s+1)*R)`` (zero-padded past ``nrow``).

    ``data[s, d, r] = A[s*R + r, s*R + r + offsets[d]]`` — the same zero
    conventions as :class:`~tpu_spmv.formats.dia.DIA`, just row-sliced.
    """

    data: jax.Array                       # [ndev, ndiags, R]
    offsets: tuple[int, ...] = static_field()
    shape: tuple[int, int] = static_field()
    nnz: int = static_field()

    @property
    def ndev(self) -> int:
        return int(self.data.shape[0])

    @property
    def rows_per_shard(self) -> int:
        return int(self.data.shape[2])

    @property
    def row_plan(self) -> RowPlan:
        return plan_uniform(self.shape[0], self.ndev)

    # x must be sharded the same uniform way (square: C == R)
    @property
    def x_plan(self) -> RowPlan:
        return plan_uniform(self.shape[1], self.ndev)

    @staticmethod
    def build(dia: DIA, ndev: int) -> "ShardedDIA":
        nrow, ncol = dia.shape
        if nrow != ncol:
            raise ValueError("ShardedDIA requires a square matrix "
                             "(halo windows assume row/col chunk parity)")
        R = plan_uniform(nrow, ndev).max_count
        band = max(max(abs(o) for o in dia.offsets), 0)
        if band > R:
            raise ValueError(
                f"band {band} exceeds chunk size {R}: the 1-hop halo "
                f"cannot cover it (use fewer devices or the CSR path)"
            )
        # jnp ops throughout: the DIA payload may already be device-
        # resident, and np.asarray would drag it back through the tunnel
        data = jnp.asarray(dia.data)                    # [ndiags, nrow]
        pad = ndev * R - nrow
        if pad:
            data = jnp.pad(data, ((0, 0), (0, pad)))
        stacked = jnp.transpose(
            data.reshape(data.shape[0], ndev, R), (1, 0, 2)
        )
        return ShardedDIA(
            data=stacked,
            offsets=dia.offsets,
            shape=dia.shape,
            nnz=dia.nnz,
        )


@sparse_dataclass
class ShardedBDIA:
    """Block-row-uniform-sharded BDIA: shard ``s`` owns block rows
    ``[s*Rb, (s+1)*Rb)``; scalar chunk size is ``Rb * bs``."""

    data: jax.Array                       # [ndev, ndiags, Rb, bs, bs]
    offsets: tuple[int, ...] = static_field()
    shape: tuple[int, int] = static_field()
    block_size: int = static_field()
    nnz: int = static_field()

    @property
    def ndev(self) -> int:
        return int(self.data.shape[0])

    @property
    def blocks_per_shard(self) -> int:
        return int(self.data.shape[2])

    @property
    def row_plan(self) -> RowPlan:
        # scalar-row plan with C = Rb * bs (uniform by construction)
        C = self.blocks_per_shard * self.block_size
        starts = tuple(min(i * C, self.shape[0])
                       for i in range(self.ndev + 1))
        return RowPlan(starts, self.ndev, self.shape[0])

    @property
    def x_plan(self) -> RowPlan:
        C = self.blocks_per_shard * self.block_size
        starts = tuple(min(i * C, self.shape[1])
                       for i in range(self.ndev + 1))
        return RowPlan(starts, self.ndev, self.shape[1])

    @staticmethod
    def build(bdia: BDIA, ndev: int) -> "ShardedBDIA":
        nrow, ncol = bdia.shape
        if nrow != ncol:
            raise ValueError("ShardedBDIA requires a square matrix")
        data = jnp.asarray(bdia.data)         # [ndiags, nbrow, bs, bs]
        nbrow = int(data.shape[1])
        Rb = max(-(-nbrow // ndev), 1)
        band = max(max(abs(o) for o in bdia.offsets), 0)
        if band > Rb:
            raise ValueError(
                f"block band {band} exceeds block chunk {Rb}: 1-hop halo "
                f"cannot cover it"
            )
        pad = ndev * Rb - nbrow
        if pad:
            data = jnp.pad(data, ((0, 0), (0, pad), (0, 0), (0, 0)))
        stacked = jnp.transpose(
            data.reshape(data.shape[0], ndev, Rb, *data.shape[2:]),
            (1, 0, 2, 3, 4),
        )
        return ShardedBDIA(
            data=stacked,
            offsets=bdia.offsets,
            shape=bdia.shape,
            block_size=bdia.block_size,
            nnz=bdia.nnz,
        )


def _ring_window(x_own, axis: str, ndev: int):
    """``[left | own | right]`` neighbor chunks — both transfers issued
    before any compute so XLA's scheduler overlaps them with the FMAs."""
    if ndev == 1:
        return jnp.concatenate([x_own, x_own, x_own])
    to_right = [(i, (i + 1) % ndev) for i in range(ndev)]
    to_left = [(i, (i - 1) % ndev) for i in range(ndev)]
    x_left = lax.ppermute(x_own, axis, to_right)   # receives left nbr's chunk
    x_right = lax.ppermute(x_own, axis, to_left)   # receives right nbr's
    return jnp.concatenate([x_left, x_own, x_right])


def spmv_dia_sharded(mesh: Mesh, A: ShardedDIA, x: ShardedVector,
                     *, axis: str = "x") -> ShardedVector:
    """Row-sharded DIA SpMV: per-shard shifted FMAs over a 1-hop halo.

    The local body is byte-for-byte the single-chip DIA kernel on a
    ``[3C]`` x window — every diagonal is a *static* slice (global row
    ``s*C + r`` reads ``x[s*C + r + off]`` = window position
    ``C + r + off``), so XLA emits the same fused elementwise pass as the
    non-distributed kernel; the ring transfers overlap it.
    """
    R = A.rows_per_shard
    ndev = A.ndev
    offsets = A.offsets

    @functools.partial(
        _shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )
    def run(A_loc: ShardedDIA, x_loc: ShardedVector):
        xw = _ring_window(x_loc.chunks[0], axis, ndev)      # [3C], C == R
        y = jnp.zeros((R,), dtype=A_loc.data.dtype)
        for d, off in enumerate(offsets):
            y = y + A_loc.data[0, d] * lax.slice_in_dim(
                xw, R + off, R + off + R)
        return y[None]

    y = run(A, x)
    return ShardedVector(chunks=y, starts=A.row_plan.starts,
                         length=A.shape[0])


def spmv_bdia_sharded(mesh: Mesh, A: ShardedBDIA, x: ShardedVector,
                      *, axis: str = "x") -> ShardedVector:
    """Row-sharded BDIA SpMV: per-shard block-diagonal einsum (MXU/VPU)
    over a 1-hop halo of block chunks."""
    Rb = A.blocks_per_shard
    bs = A.block_size
    ndev = A.ndev
    offsets = A.offsets

    @functools.partial(
        _shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )
    def run(A_loc: ShardedBDIA, x_loc: ShardedVector):
        xw = _ring_window(x_loc.chunks[0], axis, ndev)      # [3*Rb*bs]
        xb = xw.reshape(3 * Rb, bs)
        y = jnp.zeros((Rb, bs), dtype=A_loc.data.dtype)
        for d, off in enumerate(offsets):
            xs = lax.slice_in_dim(xb, Rb + off, Rb + off + Rb, axis=0)
            y = y + jnp.einsum(
                "nij,nj->ni", A_loc.data[0, d], xs,
                preferred_element_type=A_loc.data.dtype,
                precision=lax.Precision.HIGHEST,
            )
        return y.reshape(-1)[None]

    y = run(A, x)
    return ShardedVector(chunks=y, starts=A.row_plan.starts,
                         length=A.shape[0])


@sparse_dataclass
class ShardedSDIA:
    """Row-sharded STREAMING DIA: the large-matrix local kernel.

    The XLA shifted-FMA local body of :class:`ShardedDIA` drops to ~45%
    of roofline once the per-shard working set leaves VMEM; this
    container shards the :class:`~tpu_spmv.kernels.dia_stream.SDIA`
    padded-tile row space in whole-``rb``-tile chunks and runs the
    streaming Pallas kernel per shard against a ring halo of one ``rb``
    tile per side.  Global pad tiles (structurally zero data) make the
    ring's wrap-around reads harmless, exactly as in the single-chip
    kernel.  x/y chunks share the padded layout, so distributed chains
    (CG, power iteration) feed y straight back in.
    """

    data: jax.Array                       # [ndev, ndiags, Cp]
    offsets: tuple[int, ...] = static_field()
    shape: tuple[int, int] = static_field()
    nnz: int = static_field()
    L: int = static_field()               # global front pad rows
    rb: int = static_field()

    @property
    def ndev(self) -> int:
        return int(self.data.shape[0])

    @property
    def rows_per_shard(self) -> int:
        return int(self.data.shape[2])

    @property
    def npad(self) -> int:
        return self.ndev * self.rows_per_shard

    # padded-row-space plan (for ShardedVector chunking)
    @property
    def pad_plan(self) -> RowPlan:
        C = self.rows_per_shard
        return RowPlan(tuple(i * C for i in range(self.ndev + 1)),
                       self.ndev, self.npad)

    @staticmethod
    def build(sdia, ndev: int) -> "ShardedSDIA":
        from ..kernels.dia_stream import SDIA  # noqa: F401 (typing aid)

        rb = sdia.rb
        band = max(max(abs(o) for o in sdia.offsets), 0)
        if band > rb:
            raise ValueError(f"band {band} exceeds tile {rb}")
        T = sdia.npad // rb
        Tper = -(-T // ndev)
        Cp = Tper * rb
        data = sdia.data
        pad = ndev * Cp - sdia.npad
        if pad:
            data = jnp.pad(data, ((0, 0), (0, pad)))
        stacked = jnp.transpose(
            data.reshape(data.shape[0], ndev, Cp), (1, 0, 2))
        return ShardedSDIA(
            data=stacked, offsets=sdia.offsets, shape=sdia.shape,
            nnz=sdia.nnz, L=sdia.L, rb=rb,
        )

    def shard_xpad(self, xpad: jax.Array) -> ShardedVector:
        """Split a padded-row-space vector (``kernels.dia_stream.pad_x``
        layout, then zero-extended to ``npad``) into shard chunks."""
        if xpad.shape[0] < self.npad:
            xpad = jnp.pad(xpad, (0, self.npad - xpad.shape[0]))
        return ShardedVector(
            chunks=xpad.reshape(self.ndev, self.rows_per_shard),
            starts=self.pad_plan.starts, length=self.npad)

    def unshard_y(self, y: ShardedVector) -> np.ndarray:
        """Global ``[nrow]`` result from padded shard chunks (host)."""
        flat = np.asarray(y.chunks).reshape(-1)
        return flat[self.L: self.L + self.shape[0]]


def _sdia_ring_kernel(left_ref, right_ref, data_ref, xm_ref, x0_ref,
                      xp_ref, o_ref, *, offsets, rb, h, tlast):
    """The streaming-DIA tile body with ring-edge halo selection: the
    first/last local tile swaps its clipped neighbor sliver for the
    ICI-shipped one (everything else is byte-for-byte the single-chip
    ``dia_stream._kernel``)."""
    j = pl.program_id(0)
    xm = jnp.where(j == 0, left_ref[:], xm_ref[:])
    xp = jnp.where(j == tlast, right_ref[:], xp_ref[:])
    win = jnp.concatenate([xm, x0_ref[:], xp])
    acc = data_ref[0] * jax.lax.slice_in_dim(win, h + offsets[0],
                                             h + offsets[0] + rb)
    for d, off in enumerate(offsets[1:], start=1):
        acc = acc + data_ref[d] * jax.lax.slice_in_dim(win, h + off,
                                                       h + off + rb)
    o_ref[:] = acc


def _shard_map_compat(body, **smap_kwargs):
    """shard_map with the varying-mesh-axis check off (pallas_call
    outputs carry no vma annotation); jax >= 0.6 names the flag
    check_vma, older releases check_rep."""
    try:
        return _shard_map(body, check_vma=False, **smap_kwargs)
    except TypeError:  # pragma: no cover
        return _shard_map(body, check_rep=False, **smap_kwargs)


def _ring_stream_sharded(mesh, A, x, dead, *, axis, interpret, rb, Cp,
                         offsets, kern_factory, shard_ops, mat_spec,
                         n_lead):
    """Shared ring-halo runner for the sharded streaming kernels.

    Each shard ships one ``h``-sized sliver to each ring neighbor, then
    runs the streaming kernel over its own chunk with the slivers
    swapped in at the two edge tiles — per-shard HBM traffic stays
    byte-for-byte at the single-chip kernel's (the earlier
    whole-tile-halo + concatenated-x variant measured 1.37x).

    ``shard_ops(A_loc)`` returns ``(lead_ops, mat)``: ``n_lead`` SMEM
    scalars followed by the matrix operand consumed via ``mat_spec``
    (streamed data block for SDIA, resident pattern for PSDIA).
    ``kern_factory(h, Tloc)`` builds the pallas kernel.  ``dead`` is the
    donated-output ShardedVector (zero-copy chains, ``_dead_out``).
    The output dtype promotes with x (mixed-precision packs store
    narrower data; accumulation stays in the x dtype, matching the
    single-chip kernels)."""
    from ..kernels.dia_stream import _dead_out, _halo_size

    ndev = A.ndev
    Tloc = Cp // rb
    h = _halo_size(offsets, rb)
    hb = rb // h
    THloc = Cp // h

    def run_body(A_loc, x_loc, *dead_loc):
        xc = x_loc.chunks[0]                         # [Cp]
        tail = jax.lax.slice_in_dim(xc, Cp - h, Cp)
        head = jax.lax.slice_in_dim(xc, 0, h)
        if ndev == 1:
            left, right = tail, head
        else:
            to_right = [(i, (i + 1) % ndev) for i in range(ndev)]
            to_left = [(i, (i - 1) % ndev) for i in range(ndev)]
            left = lax.ppermute(tail, axis, to_right)   # left nbr's tail
            right = lax.ppermute(head, axis, to_left)   # right nbr's head
        lead, mat = shard_ops(A_loc)
        assert len(lead) == n_lead
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * n_lead + [
                pl.BlockSpec(memory_space=pltpu.VMEM),   # left sliver [h]
                pl.BlockSpec(memory_space=pltpu.VMEM),   # right sliver [h]
                mat_spec,
                pl.BlockSpec((h,),
                             lambda j: (jnp.clip(j * hb - 1, 0,
                                                 THloc - 1),),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rb,), lambda j: (j,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h,),
                             lambda j: (jnp.clip((j + 1) * hb, 0,
                                                 THloc - 1),),
                             memory_space=pltpu.VMEM),
            ])
        kern, in_specs, ops, extra = _dead_out(
            kern_factory(h, Tloc), in_specs,
            (*lead, left, right, mat, xc, xc, xc),
            dead_loc[0].chunks[0] if dead_loc else None)
        y = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(
                (Cp,), jnp.result_type(mat.dtype, xc.dtype)),
            grid=(Tloc,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((rb,), lambda j: (j,),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
            **extra,
        )(*ops)
        return y[None]

    args = (A, x) if dead is None else (A, x, dead)
    run = _shard_map_compat(run_body, mesh=mesh,
                            in_specs=(P(axis),) * len(args),
                            out_specs=P(axis))
    y = run(*args)
    return ShardedVector(chunks=y, starts=A.pad_plan.starts,
                         length=A.npad)


def spmv_sdia_sharded(mesh: Mesh, A: ShardedSDIA, x: ShardedVector,
                      *, axis: str = "x", interpret: bool = False,
                      dead: ShardedVector | None = None) -> ShardedVector:
    """Row-sharded streaming-DIA SpMV in padded row space (ring halo of
    one band-sized sliver per side; see :func:`_ring_stream_sharded`).
    ``dead`` = donated output ShardedVector for zero-copy chains."""
    rb = A.rb
    nd = int(A.data.shape[1])
    offsets = A.offsets
    return _ring_stream_sharded(
        mesh, A, x, dead, axis=axis, interpret=interpret, rb=rb,
        Cp=A.rows_per_shard, offsets=offsets,
        kern_factory=lambda h, Tloc: functools.partial(
            _sdia_ring_kernel, offsets=offsets, rb=rb, h=h,
            tlast=Tloc - 1),
        shard_ops=lambda A_loc: ((), A_loc.data[0]),
        mat_spec=pl.BlockSpec((nd, rb), lambda j: (0, j),
                              memory_space=pltpu.VMEM),   # streamed
        n_lead=0)


@sparse_dataclass
class ShardedPSDIA:
    """Row-sharded PERIODIC streaming DIA: the grid-stencil local kernel.

    Same padded-tile row-space sharding as :class:`ShardedSDIA`, but the
    per-shard operand is the replicated ``[ndiags, rb]`` coefficient
    pattern (`kernels/dia_stream.py:PSDIA`) — per-shard HBM traffic is
    x + y only.  Boundary handling moves from structurally-zero data to
    the in-kernel row mask; the shard's global row base rides in as an
    SMEM scalar (``axis_index * rows_per_shard``), so the mask logic is
    identical to the single-chip kernel's with a shifted origin.  Ring
    wrap-around slivers are harmless exactly as in ShardedSDIA: any tile
    that could read a wrapped sliver is a pad tile, and pad tiles are
    masked to zero.
    """

    pattern: jax.Array                    # [ndev, ndiags, rb] (replicated)
    offsets: tuple[int, ...] = static_field()
    shape: tuple[int, int] = static_field()
    nnz: int = static_field()
    L: int = static_field()               # global front pad rows
    period: int = static_field()
    rb: int = static_field()
    rows_per_shard: int = static_field()  # Cp (whole-rb-tile multiple)

    @property
    def ndev(self) -> int:
        return int(self.pattern.shape[0])

    @property
    def npad(self) -> int:
        return self.ndev * self.rows_per_shard

    @property
    def dtype(self):
        return self.pattern.dtype

    @property
    def pad_plan(self) -> RowPlan:
        C = self.rows_per_shard
        return RowPlan(tuple(i * C for i in range(self.ndev + 1)),
                       self.ndev, self.npad)

    @staticmethod
    def build(psdia, ndev: int) -> "ShardedPSDIA":
        rb = psdia.rb
        band = max(max(abs(o) for o in psdia.offsets), 0)
        if band > rb:
            raise ValueError(f"band {band} exceeds tile {rb}")
        T = psdia.npad // rb
        Tper = -(-T // ndev)
        Cp = Tper * rb                    # multiple of rb (hence of P):
        #                                   the pattern phase is shard-
        #                                   invariant and one copy serves
        return ShardedPSDIA(
            pattern=jnp.tile(psdia.pattern[None], (ndev, 1, 1)),
            offsets=psdia.offsets, shape=psdia.shape, nnz=psdia.nnz,
            L=psdia.L, period=psdia.period, rb=rb, rows_per_shard=Cp,
        )

    def shard_xpad(self, xpad: jax.Array) -> ShardedVector:
        if xpad.shape[0] < self.npad:
            xpad = jnp.pad(xpad, (0, self.npad - xpad.shape[0]))
        return ShardedVector(
            chunks=xpad.reshape(self.ndev, self.rows_per_shard),
            starts=self.pad_plan.starts, length=self.npad)

    def unshard_y(self, y: ShardedVector) -> np.ndarray:
        flat = np.asarray(y.chunks).reshape(-1)
        return flat[self.L: self.L + self.shape[0]]


def _psdia_ring_kernel(base_ref, left_ref, right_ref, pat_ref, xm_ref,
                       x0_ref, xp_ref, o_ref, *, offsets, rb, h, tlast,
                       L, nrow):
    """Periodic-DIA tile body: ring-edge halo selection + row mask with a
    shard-global origin (``base_ref`` = this shard's first padded row)."""
    from ..kernels.dia_stream import _rows_iota

    j = pl.program_id(0)
    xm = jnp.where(j == 0, left_ref[:], xm_ref[:])
    xp = jnp.where(j == tlast, right_ref[:], xp_ref[:])
    win = jnp.concatenate([xm, x0_ref[:], xp])
    acc = pat_ref[0] * jax.lax.slice_in_dim(win, h + offsets[0],
                                            h + offsets[0] + rb)
    for d, off in enumerate(offsets[1:], start=1):
        acc = acc + pat_ref[d] * jax.lax.slice_in_dim(win, h + off,
                                                      h + off + rb)
    start = base_ref[0] + j * rb
    interior = jnp.logical_and(start >= L, start + rb <= L + nrow)

    @pl.when(interior)
    def _():
        o_ref[:] = acc

    @pl.when(jnp.logical_not(interior))
    def _():
        rows = start + _rows_iota(rb)
        valid = (rows >= L) & (rows < L + nrow)
        o_ref[:] = jnp.where(valid, acc, jnp.zeros_like(acc))


def spmv_psdia_sharded(mesh: Mesh, A: ShardedPSDIA, x: ShardedVector,
                       *, axis: str = "x", interpret: bool = False,
                       dead: ShardedVector | None = None) -> ShardedVector:
    """Row-sharded periodic streaming-DIA SpMV in padded row space —
    the :func:`spmv_sdia_sharded` ring structure with the VMEM-resident
    pattern instead of streamed data (the shard's global row base rides
    in as an SMEM scalar for the row mask).  ``dead`` = donated output
    ShardedVector for zero-copy distributed chains."""
    rb = A.rb
    Cp = A.rows_per_shard
    nd = int(A.pattern.shape[1])
    offsets = A.offsets

    def shard_ops(A_loc):
        base = (lax.axis_index(axis) * Cp).astype(jnp.int32).reshape(1)
        return (base,), A_loc.pattern[0]

    return _ring_stream_sharded(
        mesh, A, x, dead, axis=axis, interpret=interpret, rb=rb,
        Cp=Cp, offsets=offsets,
        kern_factory=lambda h, Tloc: functools.partial(
            _psdia_ring_kernel, offsets=offsets, rb=rb, h=h,
            tlast=Tloc - 1, L=A.L, nrow=A.shape[0]),
        shard_ops=shard_ops,
        mat_spec=pl.BlockSpec((nd, rb), lambda j: (0, 0),
                              memory_space=pltpu.VMEM),   # resident
        n_lead=1)

@sparse_dataclass
class ShardedGPR:
    """Row-sharded GPR: the planner's fast local kernel for GENERAL
    patterns (the reference's per-partition CSR loop, done TPU-style).

    SPMD requires every shard to run the SAME compiled program, but a GPR
    pack's static layout (gather sublanes, class tiles, plan tiles, side
    nnz) is data-dependent.  The build therefore packs every shard
    against FORCED shape targets (the per-shard maxima) with the
    class-capacity compaction folded into each shard's y-permutation
    *values* — after which the whole GPCSR pytree stacks leaf-wise and
    flows through ``shard_map`` like any other container.
    """

    gpcsr: object                      # GPCSR with [ndev, ...] leaves
    shape: tuple[int, int] = static_field()
    row_starts: tuple[int, ...] = static_field()
    nnz: int = static_field()

    @property
    def ndev(self) -> int:
        return int(self.gpcsr.gseg.shape[0])

    @property
    def rows_per_shard(self) -> int:
        return self.gpcsr.shape[0]

    @property
    def row_plan(self) -> RowPlan:
        return RowPlan(self.row_starts, self.ndev, self.shape[0])

    @property
    def x_plan(self) -> RowPlan:
        return plan_uniform(self.shape[1], self.ndev)

    @staticmethod
    def build(sp_csr, ndev: int, *, dtype=np.float32) -> "ShardedGPR":
        import scipy.sparse as sp

        from ..kernels import gpr as _gpr

        nrow, ncol = sp_csr.shape
        if ncol > _gpr.CB_SEGS * _gpr.LANES:
            raise ValueError("sharded GPR requires single-block ncol")
        rplan = plan_uniform(nrow, ndev)
        R = rplan.max_count
        mats = []
        for i in range(ndev):
            lo, hi = rplan.starts[i], rplan.starts[i + 1]
            m = sp_csr[lo:hi].tocsr()
            if m.shape[0] < R:
                m = sp.vstack(
                    [m, sp.csr_matrix((R - m.shape[0], ncol),
                                      dtype=m.dtype)]).tocsr()
            m.sort_indices()
            mats.append(m)
        # shape targets = per-shard maxima (cheap numpy, no probe packs)
        ns8s, side_nnzs = [], []
        class_T = np.zeros(len(_gpr.CLASS_W), dtype=np.int64)
        for m in mats:
            counts = np.diff(m.indptr)
            # forced-r_p SINGLE-LEVEL routing (shape uniformity) is
            # feasible to ~900k routed entries per shard with don't-care
            # slack; a pod with more nnz needs more shards (or csr_halo)
            if int(np.minimum(counts, _gpr.LANES).sum()) > 900_000:
                raise ValueError(
                    "a shard exceeds the forced-routing cap (~900k "
                    "entries); use more devices or csr_halo")
            cls = np.minimum(np.searchsorted(_gpr.CLASS_W, counts),
                             len(_gpr.CLASS_W) - 1)
            rows_c = np.bincount(cls, minlength=len(_gpr.CLASS_W))
            for c, W in enumerate(_gpr.CLASS_W):
                k_c = _gpr.LANES // W
                class_T[c] = max(class_T[c], -(-rows_c[c] // (8 * k_c)))
            side_nnzs.append(int(np.maximum(counts - _gpr.LANES, 0).sum()))
            # gather sublanes: sum over segments of ceil(count/128) on the
            # main (<=128/row) part
            main_mask = (np.arange(m.nnz)
                         - m.indptr[:-1].repeat(counts)) < _gpr.LANES
            segs = m.indices[main_mask] >> 7
            seg_cnt = np.bincount(segs) if len(segs) else np.zeros(1, int)
            NS = max(int((-(-seg_cnt[seg_cnt > 0] // _gpr.LANES)).sum()), 1)
            ns8s.append(-(-NS // 8) * 8)
        targets = {
            "ns8": max(ns8s),
            "class_T": tuple(int(t) for t in class_T),
            "side_nnz": max(side_nnzs),
            # fixed tile fill (don't-care slack slots never route, so the
            # default fill is feasible for every shard's real flows)
            "rp": 11264,
        }
        packs = [_gpr.pack_gpr(m, dtype=dtype, targets=targets,
                               padded_y=True) for m in mats]
        # nnz is bookkeeping, but it is STATIC pytree metadata — normalize
        # it so the per-shard treedefs match for stacking
        packs = [dataclasses.replace(p, nnz=int(sp_csr.nnz))
                 for p in packs]
        stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *packs)
        return ShardedGPR(gpcsr=stacked, shape=(int(nrow), int(ncol)),
                          row_starts=rplan.starts, nnz=int(sp_csr.nnz))


def spmv_gpr_sharded(mesh: Mesh, A: ShardedGPR, x: ShardedVector,
                     *, axis: str = "x", interpret: bool = False
                     ) -> ShardedVector:
    """Row-sharded GPR SpMV: all-gather x over ICI, run the full
    gather-permute-reduce pipeline per shard (one SPMD program — the
    shards differ only in operand values)."""
    from ..kernels.gpr import spmv_gpr

    ncol = A.shape[1]

    def run_body(G_loc: ShardedGPR, x_loc: ShardedVector):
        xg = lax.all_gather(x_loc.chunks[0], axis, tiled=True)
        local = jax.tree_util.tree_map(lambda l: l[0], G_loc.gpcsr)
        y = spmv_gpr(local, xg[:ncol], interpret=interpret)
        return y[None]

    smap_kwargs = dict(mesh=mesh, in_specs=(P(axis), P(axis)),
                       out_specs=P(axis))
    try:
        run = _shard_map(run_body, check_vma=False, **smap_kwargs)
    except TypeError:  # pragma: no cover
        run = _shard_map(run_body, check_rep=False, **smap_kwargs)
    y = run(A, x)
    return ShardedVector(chunks=y, starts=A.row_plan.starts,
                         length=A.shape[0])


# ---------------------------------------------------------------------------
# The distributed planner
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DistPlan:
    """A chosen distributed execution strategy.

    ``matrix`` is the sharded container; ``shard_x``/``unshard_y`` move
    vectors between global host arrays and the mesh layout; ``spmv`` runs
    one distributed SpMV.
    """

    matrix: object
    strategy: str   # "dia" | "dia_stream" | "pdia_stream" | "bdia"
                    # | "gpr" | "csr_halo"
    x_plan: RowPlan
    row_plan: RowPlan

    def shard_x(self, x, dtype=None) -> ShardedVector:
        if self.strategy in ("dia_stream", "pdia_stream"):
            # padded-tile row space: x[k - L] at padded position k
            S = self.matrix
            xp = np.zeros(S.npad, dtype=dtype or np.asarray(x).dtype)
            xp[S.L: S.L + len(x)] = np.asarray(x)
            return ShardedVector.from_global(xp, self.x_plan, dtype=dtype)
        return ShardedVector.from_global(np.asarray(x), self.x_plan,
                                         dtype=dtype)

    def y_to_global(self, y: ShardedVector) -> np.ndarray:
        g = y.to_global()
        if self.strategy in ("dia_stream", "pdia_stream"):
            S = self.matrix
            return g[S.L: S.L + S.shape[0]]
        return g

    def spmv(self, mesh: Mesh, x: ShardedVector, *,
             axis: str = "x") -> ShardedVector:
        if self.strategy == "dia":
            return spmv_dia_sharded(mesh, self.matrix, x, axis=axis)
        if self.strategy == "dia_stream":
            interp = jax.devices()[0].platform == "cpu"
            return spmv_sdia_sharded(mesh, self.matrix, x, axis=axis,
                                     interpret=interp)
        if self.strategy == "pdia_stream":
            interp = jax.devices()[0].platform == "cpu"
            return spmv_psdia_sharded(mesh, self.matrix, x, axis=axis,
                                      interpret=interp)
        if self.strategy == "bdia":
            return spmv_bdia_sharded(mesh, self.matrix, x, axis=axis)
        if self.strategy == "gpr":
            interp = jax.devices()[0].platform == "cpu"
            return spmv_gpr_sharded(mesh, self.matrix, x, axis=axis,
                                    interpret=interp)
        from .spmv import spmv_allgather, spmv_halo, spmv_neighbor

        if self.strategy == "csr_neighbor":
            return spmv_neighbor(mesh, self.matrix, x, axis=axis)
        if self.strategy == "csr_allgather":
            return spmv_allgather(mesh, self.matrix, x, axis=axis)
        return spmv_halo(mesh, self.matrix, x, axis=axis)


#: distributed cost-model constants.  ``GATHER_GVALS`` is the measured
#: XLA gather+segment-sum throughput on chip (ops/auto.py's cost model —
#: the local kernel all three CSR strategies share).  ``LINK_GBPS`` is
#: the per-link ICI bandwidth the comm terms divide by; the default is a
#: v5e-order number and every entry point takes it as a parameter so the
#: model transfers to real pod links (VERDICT r4 item 3).
GATHER_GVALS = 0.13
LINK_GBPS = 90.0


def predict_dist_costs(sp_csr, ndev: int, *, balance: str = "nnz",
                       square: bool = False, itemsize: int = 4,
                       link_gbps: float = LINK_GBPS,
                       gather_gvals: float = GATHER_GVALS) -> dict:
    """Analytic per-SpMV cost model for the general-CSR distributed
    strategies (``csr_neighbor`` / ``csr_allgather`` / ``csr_halo``).

    All three run the same gather+segment-sum local kernel, so the model
    is two terms per strategy: padded gather WORK (values/s at the
    measured ``gather_gvals``) and x-chunk TRAFFIC (bytes/s at
    ``link_gbps``), with the neighbor strategy's halo transfer credited
    as overlapped with its interior compute.  The ring (``csr_halo``)
    pays ``ndev × max_bucket`` padded work — the inflation measured at
    6.6x on banded operators in ``DIST_r04.json`` — and wins only when
    buckets are balanced AND the x working set must rotate anyway.

    Returns ``{strategy: {"predicted_us", "work_vals", "comm_bytes"}}``
    plus a ``"pick"`` key naming the argmin.
    """
    import scipy.sparse as sp

    csr = sp_csr.tocsr() if sp.issparse(sp_csr) else sp_csr.to_scipy().tocsr()
    nrow, ncol = csr.shape
    indptr = np.asarray(csr.indptr, dtype=np.int64)
    rplan = plan_rows(indptr, ndev, balance=balance)
    cplan = rplan if (square and nrow == ncol) else plan_even(ncol, ndev)
    C = max(cplan.max_count, 1)
    cols = np.asarray(csr.indices, dtype=np.int64)
    counts = np.diff(indptr)
    row_ids = np.repeat(np.arange(nrow, dtype=np.int64), counts)
    shard = rplan.owner_of(row_ids)
    owner = cplan.owner_of(cols)
    delta = (owner - shard) % ndev
    interior = delta == 0
    nnz_per = np.bincount(shard, minlength=ndev)
    nnzp = max(int(nnz_per.max()), 1)                 # allgather pad
    nnzi = max(int(np.bincount(shard[interior], minlength=ndev).max()), 1)
    nnzb = max(int(np.bincount(shard[~interior], minlength=ndev).max()), 0)
    k = len(np.unique(delta[~interior]))              # halo offsets
    ring_bucket = max(int(np.bincount(shard * ndev + delta,
                                      minlength=ndev * ndev).max()), 1)
    rate = gather_gvals * 1e9
    bw = link_gbps * 1e9
    chunk_bytes = C * itemsize

    ag_work, ag_comm = nnzp, (ndev - 1) * chunk_bytes
    t_ag = ag_work / rate + ag_comm / bw              # x lands, then compute
    nb_comm = k * chunk_bytes
    # halo transfers overlap the interior bucket's compute
    t_nb = max(nnzi / rate, nb_comm / bw) + nnzb / rate
    ring_work = ndev * ring_bucket
    t_ring = max(ring_work / rate, (ndev - 1) * chunk_bytes / bw)
    out = {
        "csr_allgather": {"predicted_us": round(t_ag * 1e6, 2),
                          "work_vals": int(ag_work),
                          "comm_bytes": int(ag_comm)},
        "csr_neighbor": {"predicted_us": round(t_nb * 1e6, 2),
                         "work_vals": int(nnzi + nnzb),
                         "comm_bytes": int(nb_comm),
                         "halo_offsets": int(k)},
        "csr_halo": {"predicted_us": round(t_ring * 1e6, 2),
                     "work_vals": int(ring_work),
                     "comm_bytes": int((ndev - 1) * chunk_bytes)},
    }
    out["pick"] = min(
        ("csr_neighbor", "csr_allgather", "csr_halo"),
        key=lambda s: out[s]["predicted_us"])
    return out


def plan_dist_spmv(host_mat, ndev: int, *, dtype=None,
                   strategy: str | None = None,
                   sdia_rb: int | None = None) -> DistPlan:
    """Analyze on host, shard with the matching fast local kernel.

    Same storage-ratio heuristics as the single-chip planner
    (:func:`tpu_spmv.ops.auto.plan_spmv`): DIA/BDIA when the pattern is
    (block-)banded enough to stream — with the streaming Pallas local
    kernel (``dia_stream``) once the per-shard working set clearly
    exceeds VMEM — else the bucketed ``HaloCSR`` segment-sum fallback.
    ``strategy`` forces a choice; ``sdia_rb`` overrides the streaming
    tile size (tests use small tiles).
    """
    from ..formats import convert
    from ..ops.auto import _host_coo, analyze

    if strategy not in (None, "dia", "dia_stream", "pdia_stream", "bdia",
                        "gpr", "csr_halo", "csr_neighbor",
                        "csr_allgather"):
        raise ValueError(
            f"unknown distributed strategy {strategy!r}; valid: dia, "
            f"dia_stream, pdia_stream, bdia, gpr, csr_halo, "
            f"csr_neighbor, csr_allgather"
        )
    coo = _host_coo(host_mat, dtype)
    stats = analyze(coo)
    nrow, ncol = coo.shape
    square = nrow == ncol

    def try_dia():
        dia = convert(coo, "dia")
        sharded = ShardedDIA.build(dia, ndev)     # raises if band > chunk
        return DistPlan(sharded, "dia", sharded.x_plan, sharded.row_plan)

    def try_sdia():
        from ..kernels import dia_stream

        dia = convert(coo, "dia")
        sd = dia_stream.pack_sdia(dia, rb=sdia_rb)
        sharded = ShardedSDIA.build(sd, ndev)
        return DistPlan(sharded, "dia_stream", sharded.pad_plan,
                        sharded.pad_plan)

    def try_psdia():
        from ..formats.dia import DIA as _DIA
        from ..kernels import dia_stream

        hdata, hoffs = _DIA.host_arrays(coo)
        hdia = _DIA(data=hdata, offsets=hoffs, shape=coo.shape,
                    nnz=stats.nnz)
        period = dia_stream.detect_period(hdia)
        if period is None:
            raise ValueError("no periodic diagonal structure")
        # period came from detect_period on the SAME host data —
        # re-verifying would materialize [nd, nrow] temporaries on a
        # host that demand-pages at ~6 MB/s
        ps = dia_stream.pack_psdia(hdia, period=period, rb=sdia_rb,
                                   verify=False)
        sharded = ShardedPSDIA.build(ps, ndev)
        return DistPlan(sharded, "pdia_stream", sharded.pad_plan,
                        sharded.pad_plan)

    def try_bdia():
        bdia = convert(coo, "bdia", block_size=8)
        sharded = ShardedBDIA.build(bdia, ndev)
        return DistPlan(sharded, "bdia", sharded.x_plan, sharded.row_plan)

    if strategy in ("dia", "bdia", "dia_stream", "pdia_stream"):
        return {"dia": try_dia, "bdia": try_bdia, "dia_stream": try_sdia,
                "pdia_stream": try_psdia}[strategy]()
    if strategy is None and square and stats.nnz:
        dia_storage = stats.ndiags * stats.nrow
        bdia_storage = stats.nblockdiags_8 * (-(-stats.nrow // 8)) * 64
        if dia_storage <= 4 * stats.nnz and dia_storage <= bdia_storage:
            itemsize = np.dtype(dtype or np.float32).itemsize
            if dia_storage * itemsize > 32 * (1 << 20) * ndev:
                try:
                    return try_psdia()
                except ValueError:
                    pass
                try:
                    return try_sdia()
                except ValueError:
                    pass
            try:
                return try_dia()
            except ValueError:
                pass
        if bdia_storage <= 4 * stats.nnz:
            try:
                return try_bdia()
            except ValueError:
                pass
    # general pattern: build from the HOST scipy CSR — a device CSR's
    # leaves would round-trip the tunnel inside the builders
    sp_csr = coo.to_scipy().tocsr()
    sp_csr.sort_indices()
    gpr_wanted = strategy == "gpr" or (
        strategy is None
        and ncol <= 2_800_000
        and stats.nnz and stats.nnz // ndev <= 800_000
    )
    if gpr_wanted:
        try:
            sharded = ShardedGPR.build(sp_csr, ndev, dtype=dtype
                                       or np.float32)
            return DistPlan(sharded, "gpr", sharded.x_plan,
                            sharded.row_plan)
        except ValueError:
            if strategy == "gpr":
                raise
    # general-CSR fallback: the measured cost model picks among the
    # neighbor-halo, all-gather and ring strategies (VERDICT r4 item 3);
    # an explicit strategy= overrides it
    if strategy is None:
        strategy = predict_dist_costs(sp_csr, ndev, square=square)["pick"]
    if strategy == "csr_neighbor":
        nb = NeighborCSR.build(sp_csr, ndev, square=square)
        return DistPlan(nb, "csr_neighbor", nb.col_plan, nb.row_plan)
    if strategy == "csr_allgather":
        ag = ShardedCSR.build(sp_csr, ndev, square=square)
        return DistPlan(ag, "csr_allgather", ag.col_plan, ag.row_plan)
    halo = HaloCSR.build(sp_csr, ndev, square=square)
    return DistPlan(halo, "csr_halo", halo.col_plan, halo.row_plan)


def bench_dist_spmv(host_mat, mesh: Mesh, *, dtype=None, iters: int = 50,
                    check: bool = True, quiet: bool = False,
                    axis: str = "x", strategy: str | None = None) -> dict:
    """Benchmark the planned distributed SpMV over ``mesh`` with the
    chained protocol (the ``dist_bench`` the round-1 review asked for).

    Square matrices only: the chained step feeds y chunks back as x
    chunks, which requires the row and column plans to coincide — true
    for the dia/bdia strategies and for ``csr_halo`` built square.
    """
    from ..bench.harness import time_chained, verify_against_oracle
    from .spmv import place

    ndev = int(np.prod(list(mesh.shape.values())))
    plan = plan_dist_spmv(host_mat, ndev, dtype=dtype, strategy=strategy)
    nrow, ncol = plan.matrix.shape
    if nrow != ncol:
        raise ValueError("bench_dist_spmv requires a square matrix")
    A = place(plan.matrix, mesh, axis=axis)
    rng = np.random.default_rng(0)
    x = rng.random(ncol).astype(np.float32 if dtype is None else dtype)
    xs = place(plan.shard_x(x, dtype=dtype), mesh, axis=axis)

    import scipy.sparse as sp

    host = (host_mat if sp.issparse(host_mat)
            else host_mat.to_scipy()).tocsr().astype(np.float64)
    rel = float("nan")
    if check:
        y = plan.spmv(mesh, xs, axis=axis)
        # the canonical gate (bench/harness.py) — dtype-scaled tolerance,
        # raises on failure
        rel = verify_against_oracle(plan.matrix, x, plan.y_to_global(y),
                                    oracle=host)

    inf_norm = float(np.abs(host).sum(axis=1).max())
    scale = np.asarray(1.0 / max(inf_norm, 1e-300), dtype=x.dtype)
    strat, xpl, rpl = plan.strategy, plan.x_plan, plan.row_plan

    def step(v: ShardedVector, M) -> ShardedVector:
        # M rides as a jit argument (closure capture would bake the
        # shards into the compiled payload — see time_chained)
        y = DistPlan(M, strat, xpl, rpl).spmv(mesh, v, axis=axis)
        return ShardedVector(chunks=y.chunks * scale, starts=v.starts,
                             length=v.length)

    sec = time_chained(step, xs, iters=iters, operands=(A,))
    nnz = plan.matrix.nnz
    gflops = 2 * nnz / sec / 1e9
    if not quiet:
        print(f"### CSR DIST{ndev} GFLOPS = {gflops:.5f}")
        print(f"    DIST{ndev}: strategy={plan.strategy} | "
              f"{sec * 1e3:.3f} ms/iter | rel_err={rel:.2e}")
    return {"format": "CSR", "mode": f"DIST{ndev}", "gflops": gflops,
            "seconds": sec, "strategy": plan.strategy, "rel_err": rel,
            "ndev": ndev, "iters": iters}
