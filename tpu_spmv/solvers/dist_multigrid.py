"""Distributed geometric multigrid: the MG-PCG preconditioner under SPMD.

The serial V-cycle (:mod:`.multigrid`) is pure stencil arithmetic — the
only data dependencies that cross a row-sharded grid boundary are (a) the
±1-row neighbor reads of the smoother/residual stencil and (b) the 1-row
support of the cell-centered transfers.  So the TPU-native distributed
form is ONE ``shard_map`` program per application:

- the [gx, gy] grid is row-sharded over the 1-D mesh (each device holds a
  ``[gx/ndev, gy]`` block; the flat vector is the uniform
  :func:`~tpu_spmv.dist.partition.plan_uniform` split, which aligns with
  grid rows exactly when ``gx % ndev == 0``);
- stencil halos move by ``lax.ppermute`` (one [1, gy] row per neighbor per
  apply).  Edge shards receive ppermute's structural ZEROS — exactly the
  eliminated-Dirichlet closure, no masking needed;
- row-direction prolongation needs the CLAMPED end semantics of
  :func:`.multigrid._interp1d`, so the received halo is replaced by the
  shard's own boundary row on the global-edge shards
  (``lax.axis_index`` select);
- restriction is the EXACT adjoint of the sharded prolongation via
  ``jax.vjp`` — JAX transposes ``ppermute`` to the reverse permutation,
  so adjointness (and hence PCG-validity) holds ACROSS shards too;
- once a level's local block is thinner than ``min_local`` rows, the grid
  is ``all_gather``-ed (it is tiny by then) and the remaining levels run
  REPLICATED — every device computes the identical coarse correction, and
  each slices its own row block back for the sharded prolongation.

The whole V-cycle still contains ZERO reductions: its only collectives
are the halo ppermutes and the one small all_gather.  The operator it
applies is numerically the serial :func:`.multigrid.mg_preconditioner`
(same hierarchy, same smoother, same Chebyshev coarsest solve), which the
tests check directly.

Reference analog: none — the reference's NUMA layer stops at SpMV
(`/root/reference/src/mat_vec.cpp`); this is the deep end of what its
partition-and-pin design would need to become on a pod.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..dist.sharded import ShardedVector
from .multigrid import _cheby_solve, _interp1d, _prolong, \
    poisson_stencil_apply

__all__ = ["dist_mg_preconditioner"]


def _halo_rows(u, axis: str, ndev: int):
    """(row above, row below) for a row-sharded block: my neighbors'
    boundary rows via ppermute; global-edge shards receive ZEROS (the
    Dirichlet closure)."""
    if ndev == 1:
        z = jnp.zeros_like(u[:1])
        return z, z
    down = [(i, i + 1) for i in range(ndev - 1)]    # send my last row down
    up = [(i + 1, i) for i in range(ndev - 1)]      # send my first row up
    from_prev = lax.ppermute(u[-1:], axis, down)
    from_next = lax.ppermute(u[:1], axis, up)
    return from_prev, from_next


def _stencil_sharded(u, shift, axis: str, ndev: int):
    """Axis-0-sharded (2d+1)-point ``(2d + shift) u - Σ neighbors``
    (zero-Dirichlet), the SPMD form of
    :func:`.multigrid.poisson_stencil_apply` for 2-D/3-D grids: axis 0
    neighbors come from the ppermute halos, the local axes reuse the
    serial pad/slice form."""
    d = u.ndim
    up, dn = _halo_rows(u, axis, ndev)
    y = (2.0 * d + shift) * u
    for ax in range(1, d):
        lo = [slice(None)] * d
        hi = [slice(None)] * d
        lo[ax] = slice(1, None)
        hi[ax] = slice(None, -1)
        pad_lo = [(0, 0)] * d
        pad_hi = [(0, 0)] * d
        pad_lo[ax] = (0, 1)
        pad_hi[ax] = (1, 0)
        y = y - jnp.pad(u[tuple(lo)], pad_lo) \
              - jnp.pad(u[tuple(hi)], pad_hi)
    y = y - jnp.concatenate([u[1:], dn], axis=0) \
          - jnp.concatenate([up, u[:-1]], axis=0)
    return y


def _interp_rows_sharded(u, axis: str, ndev: int):
    """Row-direction cell-centered interpolation with CLAMPED global ends
    (the SPMD form of :func:`.multigrid._interp1d` along axis 0): the
    u[i-1]/u[i+1] reads at shard boundaries come from the neighbors, and
    the global-edge shards clamp to their own boundary row."""
    if ndev == 1:
        return _interp1d(u, 0)
    from_prev, from_next = _halo_rows(u, axis, ndev)
    idx = lax.axis_index(axis)
    prev_row = jnp.where(idx == 0, u[:1], from_prev)
    next_row = jnp.where(idx == ndev - 1, u[-1:], from_next)
    um = jnp.concatenate([prev_row, u[:-1]], axis=0)   # u[i-1]
    up = jnp.concatenate([u[1:], next_row], axis=0)    # u[i+1]
    even = (3.0 * u + um) * 0.25
    odd = (3.0 * u + up) * 0.25
    stacked = jnp.stack([even, odd], axis=1)       # [lx, 2, rest...]
    return stacked.reshape((u.shape[0] * 2,) + u.shape[1:])


def _prolong_sharded(uc, axis: str, ndev: int):
    """d-linear prolongation, axis 0 sharded: the sharded axis-0 interp
    then the serial (fully local) interps along the remaining axes."""
    f = _interp_rows_sharded(uc, axis, ndev)
    for ax in range(1, uc.ndim):
        f = _interp1d(f, ax)
    return f


def dist_mg_preconditioner(mesh: Mesh, grid_shape: Sequence[int], *,
                           shift: float = 0.0, nu1: int = 2, nu2: int = 2,
                           omega: float = 0.8, coarsest: int = 8,
                           coarse_degree: int = 16, min_local: int = 8,
                           axis: str = "x") -> Callable:
    """Build ``apply(r: ShardedVector) -> ShardedVector``, the SPMD
    MG V-cycle preconditioner for the axis-0-sharded grid Poisson
    operator ``laplacian_2d/_3d(...) + shift·I`` (2-D and 3-D grids).

    Pass as ``precond=`` to :func:`~tpu_spmv.solvers.dist_cg`.  The
    vector must be the :func:`~tpu_spmv.dist.partition.plan_uniform`
    split of the flat ``[prod(grid_shape)]`` grid vector with
    ``grid_shape[0] % ndev == 0`` (the uniform split then lands exactly
    on axis-0 slab boundaries).

    ``min_local``: levels whose local slab would be thinner than this
    run replicated after one small ``all_gather`` (see module
    docstring).
    """
    gshape = tuple(int(g) for g in grid_shape)
    d = len(gshape)
    if d not in (2, 3):
        raise ValueError(f"dist_mg_preconditioner supports 2-D/3-D "
                         f"grids, got {gshape}")
    gx = gshape[0]
    ndev = mesh.shape[axis]
    if gx % ndev:
        raise ValueError(f"gx={gx} must be divisible by ndev={ndev}")
    if nu1 < 0 or nu2 < 0 or nu1 + nu2 == 0:
        raise ValueError("need nu1 + nu2 >= 1 smoothing sweeps")
    if nu1 != nu2:
        # see mg_preconditioner: unequal sweep counts break V-cycle
        # symmetry and hence PCG validity (ADVICE r4)
        import warnings
        warnings.warn(
            f"nu1={nu1} != nu2={nu2} makes the V-cycle non-symmetric; "
            "the result is not a valid PCG preconditioner", stacklevel=2)
    # the SAME level geometry as the serial mg_preconditioner
    shapes = [gshape]
    shifts = [float(shift)]
    while (all(g % 2 == 0 for g in shapes[-1])
           and min(shapes[-1]) > coarsest):
        shapes.append(tuple(g // 2 for g in shapes[-1]))
        shifts.append(shifts[-1] * 4.0)
    nlev = len(shapes)
    # sharded prefix: local axis-0 slab stays even-sized and >= min_local
    nshard = 0
    while (nshard < nlev - 1
           and shapes[nshard][0] % ndev == 0
           and shapes[nshard][0] // ndev >= max(min_local, 2)
           and (shapes[nshard][0] // ndev) % 2 == 0):
        nshard += 1
    n = math.prod(gshape)
    C = n // ndev
    local0 = (gx // ndev,) + gshape[1:]

    def halfzero(r):
        # a zero of the NEXT level's local shape DERIVED from r so it
        # carries r's varying-across-mesh type — a fresh jnp.zeros is
        # unvarying and shard_map's vjp rejects the cotangent
        return r[tuple(slice(None, None, 2) for _ in range(r.ndim))] * 0

    def smooth(u, b, lvl, sweeps):
        dinv = omega / (2.0 * d + shifts[lvl])
        for _ in range(sweeps):
            u = u + dinv * (b - _stencil_sharded(u, shifts[lvl], axis,
                                                 ndev))
        return u

    def restrict_sharded(r, lvl):
        _, vjp = jax.vjp(lambda c: _prolong_sharded(c, axis, ndev),
                         halfzero(r))
        return vjp(r)[0] * (0.5 ** d)

    # ---- replicated tail (serial code on the gathered grid) -----------
    def smooth_rep(u, b, lvl, sweeps):
        dinv = omega / (2.0 * d + shifts[lvl])
        for _ in range(sweeps):
            u = u + dinv * (b - poisson_stencil_apply(u, shifts[lvl]))
        return u

    def restrict_rep(r, lvl):
        _, vjp = jax.vjp(_prolong, halfzero(r))
        return vjp(r)[0] * (0.5 ** d)

    def vcycle_rep(lvl, b):
        if lvl == nlev - 1:
            g = max(shapes[lvl])
            c = shifts[lvl]
            lmin = c + 4.0 * d * math.sin(math.pi / (4.0 * g)) ** 2
            lmax = c + 4.0 * d
            return _cheby_solve(b, lambda v: poisson_stencil_apply(v, c),
                                lmin, lmax, coarse_degree)
        u = smooth_rep(jnp.zeros_like(b), b, lvl, nu1)
        r = b - poisson_stencil_apply(u, shifts[lvl])
        e = vcycle_rep(lvl + 1, restrict_rep(r, lvl))
        u = u + 4.0 * _prolong(e)
        return smooth_rep(u, b, lvl, nu2)

    def vcycle(lvl, b):
        if lvl == nshard:
            # switch: gather the (small) level grid, run replicated, and
            # slice this shard's slab back
            lx = shapes[lvl][0] // ndev
            b_rep = lax.all_gather(b, axis, tiled=True)
            z_rep = vcycle_rep(lvl, b_rep)
            start = (lax.axis_index(axis) * jnp.int32(lx),) + \
                (jnp.int32(0),) * (d - 1)
            return lax.dynamic_slice(z_rep, start,
                                     (lx,) + shapes[lvl][1:])
        u = smooth(jnp.zeros_like(b), b, lvl, nu1)
        r = b - _stencil_sharded(u, shifts[lvl], axis, ndev)
        e = vcycle(lvl + 1, restrict_sharded(r, lvl))
        u = u + 4.0 * _prolong_sharded(e, axis, ndev)
        return smooth(u, b, lvl, nu2)

    @functools.partial(_shard_map, mesh=mesh, in_specs=(P(axis),),
                       out_specs=P(axis))
    def run(chunks):
        b = chunks[0].reshape(local0)
        z = vcycle(0, b)
        return z.reshape(1, C)

    starts = tuple(i * C for i in range(ndev + 1))

    def apply(r: ShardedVector) -> ShardedVector:
        if r.length != n or r.chunk_size != C or r.starts != starts:
            raise ValueError(
                f"dist_mg_preconditioner built for the uniform "
                f"{'x'.join(map(str, gshape))} grid split over {ndev} "
                f"shards (chunks of {C}); got length={r.length} "
                f"chunk={r.chunk_size}")
        return ShardedVector(chunks=run(r.chunks), starts=r.starts,
                             length=r.length)

    return apply
