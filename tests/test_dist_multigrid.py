"""Distributed geometric multigrid (solvers/dist_multigrid.py) on the
8-virtual-device CPU mesh: the SPMD V-cycle must apply the SAME operator
as the serial mg_preconditioner, stay symmetric across shards (the
PCG-validity requirement), and collapse dist_cg's iteration count."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_spmv import dist, utils
from tpu_spmv.dist import blas
from tpu_spmv.dist.partition import plan_uniform
from tpu_spmv.dist.sharded import HaloCSR, ShardedVector
from tpu_spmv.solvers import (dist_cg, dist_mg_preconditioner,
                              mg_preconditioner)


@pytest.fixture(scope="module")
def mesh():
    return dist.make_mesh(8)


def _sharded(x, gx, gy, ndev):
    return ShardedVector.from_global(
        np.asarray(x, np.float32), plan_uniform(gx * gy, ndev))


@pytest.mark.parametrize("gx,gy,ndev", [(64, 64, 8), (64, 48, 4),
                                        (32, 32, 1), (32, 32, 8)])
def test_dist_vcycle_matches_serial(mesh, gx, gy, ndev):
    # (32, 32, 8): local slab 4 < min_local -> nshard=0, the whole cycle
    # runs replicated behind one gather (the small-grid degenerate path)
    sub = dist.make_mesh(ndev) if ndev != 8 else mesh
    rng = np.random.default_rng(7)
    r = rng.standard_normal(gx * gy).astype(np.float32)
    z_ser = np.asarray(mg_preconditioner((gx, gy))(jnp.asarray(r)))
    M = dist_mg_preconditioner(sub, (gx, gy))
    z_dist = M(_sharded(r, gx, gy, ndev)).to_global()
    np.testing.assert_allclose(z_dist, z_ser, rtol=2e-5, atol=1e-6)


def test_dist_vcycle_matches_serial_3d(mesh):
    gx, gy, gz = 64, 32, 32
    rng = np.random.default_rng(11)
    r = rng.standard_normal(gx * gy * gz).astype(np.float32)
    z_ser = np.asarray(mg_preconditioner((gx, gy, gz))(jnp.asarray(r)))
    M = dist_mg_preconditioner(mesh, (gx, gy, gz))
    z_dist = M(ShardedVector.from_global(
        r, plan_uniform(gx * gy * gz, 8))).to_global()
    np.testing.assert_allclose(z_dist, z_ser, rtol=2e-5, atol=1e-6)


def test_dist_vcycle_matches_serial_shifted(mesh):
    gx = gy = 64
    rng = np.random.default_rng(8)
    r = rng.standard_normal(gx * gy).astype(np.float32)
    z_ser = np.asarray(mg_preconditioner((gx, gy), shift=0.5)(
        jnp.asarray(r)))
    M = dist_mg_preconditioner(mesh, (gx, gy), shift=0.5)
    z_dist = M(_sharded(r, gx, gy, 8)).to_global()
    np.testing.assert_allclose(z_dist, z_ser, rtol=2e-5, atol=1e-6)


def test_dist_vcycle_symmetric(mesh):
    # <M a, b> == <a, M b> — exact-adjoint transfers across shards
    gx = gy = 64
    rng = np.random.default_rng(9)
    a = _sharded(rng.standard_normal(gx * gy), gx, gy, 8)
    b = _sharded(rng.standard_normal(gx * gy), gx, gy, 8)
    M = dist_mg_preconditioner(mesh, (gx, gy))
    lhs = float(blas.dot(M(a), b))
    rhs = float(blas.dot(a, M(b)))
    assert abs(lhs - rhs) <= 1e-4 * max(abs(lhs), abs(rhs))


def test_dist_mgpcg_iteration_collapse(mesh):
    gx = gy = 64
    sp = utils.laplacian_2d(gx, gy).tocsr().astype(np.float32)
    A = HaloCSR.build(sp, 8, balance="rows", square=True)
    assert A.row_starts == plan_uniform(gx * gy, 8).starts
    rng = np.random.default_rng(10)
    bh = rng.standard_normal(gx * gy).astype(np.float32)
    b = ShardedVector.from_global(bh, A.row_plan)
    M = dist_mg_preconditioner(mesh, (gx, gy))
    res = dist_cg(mesh, A, b, tol=1e-6, maxiter=300, precond=M)
    plain = dist_cg(mesh, A, b, tol=1e-6, maxiter=300)
    assert bool(res.converged)
    assert int(res.iterations) <= 25
    assert int(res.iterations) * 3 < int(plain.iterations)
    # true residual on host
    x = res.x.to_global()
    rtrue = bh - sp @ x
    assert np.linalg.norm(rtrue) <= 1e-5 * np.linalg.norm(bh)


def test_dist_vcycle_deterministic(mesh):
    # the determinism guarantee (SURVEY aux: race detection) extends to
    # the SPMD V-cycle: repeated applies are BITWISE identical — no
    # atomics, no reduction-order ambiguity (its only collectives are
    # ppermutes and one all_gather, both order-preserving)
    gx = gy = 64
    r = _sharded(np.random.default_rng(12).standard_normal(gx * gy),
                 gx, gy, 8)
    M = dist_mg_preconditioner(mesh, (gx, gy))
    z1 = np.asarray(M(r).chunks)
    z2 = np.asarray(M(r).chunks)
    np.testing.assert_array_equal(z1, z2)


def test_dist_mg_validation(mesh):
    M = dist_mg_preconditioner(mesh, (64, 64))
    bad = _sharded(np.zeros(32 * 32), 32, 32, 8)
    with pytest.raises(ValueError, match="uniform"):
        M(bad)
    with pytest.raises(ValueError, match="divisible"):
        dist_mg_preconditioner(mesh, (36, 64))
