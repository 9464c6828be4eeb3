"""Nonsymmetric Krylov solvers (BiCGSTAB, restarted GMRES) against
scipy/numpy oracles — matvec-only, so they run on every planner strategy."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import tpu_spmv as ts
from tpu_spmv import utils
from tpu_spmv.ops.auto import plan_spmv
from tpu_spmv.solvers import jacobi_preconditioner
from tpu_spmv.solvers.krylov import bicgstab, gmres


@pytest.fixture(scope="module")
def nonsym():
    # convection-diffusion-like: Laplacian + skew perturbation, strongly
    # diagonally dominant (well-conditioned, genuinely nonsymmetric)
    lap = utils.laplacian_2d(10, 10)
    rng = np.random.default_rng(42)
    pert = sp.random(lap.shape[0], lap.shape[1], density=0.02,
                     random_state=rng, format="csr")
    m = (lap + 0.5 * (pert - pert.T)
         + 2.0 * sp.eye(lap.shape[0], format="csr")).tocsr()
    assert (m != m.T).nnz > 0
    return m


@pytest.fixture(scope="module")
def bvec(nonsym):
    return np.random.default_rng(7).standard_normal(nonsym.shape[0])


def _check(res, m, b, tol=1e-8):
    assert bool(res.converged), float(res.residual_norm)
    x = np.asarray(res.x, np.float64)
    r = b - m.astype(np.float64) @ x
    assert np.linalg.norm(r) <= 10 * tol * np.linalg.norm(b)


def test_bicgstab_nonsym(nonsym, bvec):
    A = ts.convert(ts.COO.from_scipy(nonsym), "csr")
    res = bicgstab(A, jnp.asarray(bvec), tol=1e-10, maxiter=2000)
    _check(res, nonsym, bvec, 1e-10)


def test_bicgstab_preconditioned(nonsym, bvec):
    A = ts.convert(ts.COO.from_scipy(nonsym), "csr")
    plain = bicgstab(A, jnp.asarray(bvec), tol=1e-10, maxiter=2000)
    pre = bicgstab(A, jnp.asarray(bvec), tol=1e-10, maxiter=2000,
                   precond=jacobi_preconditioner(A))
    _check(pre, nonsym, bvec, 1e-10)
    assert int(pre.iterations) <= int(plain.iterations) + 5


def test_bicgstab_through_plan(nonsym, bvec):
    plan = plan_spmv(nonsym)
    res = bicgstab(plan, jnp.asarray(bvec), tol=1e-10, maxiter=2000)
    _check(res, nonsym, bvec, 1e-10)


def test_bicgstab_zero_rhs(nonsym):
    A = ts.convert(ts.COO.from_scipy(nonsym), "csr")
    res = bicgstab(A, jnp.zeros(nonsym.shape[0]), tol=1e-10)
    assert bool(res.converged) and int(res.iterations) == 0
    assert np.all(np.asarray(res.x) == 0)


def test_gmres_nonsym(nonsym, bvec):
    A = ts.convert(ts.COO.from_scipy(nonsym), "csr")
    res = gmres(A, jnp.asarray(bvec), tol=1e-10, restart=30, maxiter=2000)
    _check(res, nonsym, bvec, 1e-10)


def test_gmres_small_restart(nonsym, bvec):
    # restart shorter than the Krylov dimension needed: must still
    # converge through multiple cycles
    A = ts.convert(ts.COO.from_scipy(nonsym), "csr")
    res = gmres(A, jnp.asarray(bvec), tol=1e-8, restart=8, maxiter=4000)
    _check(res, nonsym, bvec, 1e-8)


def test_gmres_preconditioned(nonsym, bvec):
    A = ts.convert(ts.COO.from_scipy(nonsym), "csr")
    plain = gmres(A, jnp.asarray(bvec), tol=1e-10, restart=20, maxiter=2000)
    pre = gmres(A, jnp.asarray(bvec), tol=1e-10, restart=20, maxiter=2000,
                precond=jacobi_preconditioner(A))
    _check(pre, nonsym, bvec, 1e-10)
    assert int(pre.iterations) <= int(plain.iterations)


def test_gmres_converges_within_first_cycle(nonsym, bvec):
    # restart much larger than needed: the masked Arnoldi tail must not
    # corrupt the solution
    A = ts.convert(ts.COO.from_scipy(nonsym), "csr")
    res = gmres(A, jnp.asarray(bvec), tol=1e-10, restart=150, maxiter=300)
    _check(res, nonsym, bvec, 1e-10)
    assert int(res.iterations) <= 150


def test_gmres_exact_x0(nonsym, bvec):
    x_ref = np.linalg.solve(nonsym.toarray(), bvec)
    A = ts.convert(ts.COO.from_scipy(nonsym), "csr")
    res = gmres(A, jnp.asarray(bvec), x0=jnp.asarray(x_ref), tol=1e-8)
    assert bool(res.converged) and int(res.iterations) == 0


def test_gmres_matvec_closure(nonsym, bvec):
    A = ts.convert(ts.COO.from_scipy(nonsym), "csr")
    res = gmres(lambda v: ts.ops.spmv(A, v), jnp.asarray(bvec),
                tol=1e-10, restart=30, maxiter=2000)
    _check(res, nonsym, bvec, 1e-10)


def test_bicgstab_spd_matches_cg_quality(bvec):
    # sanity on an SPD operator: BiCGSTAB and GMRES both solve it too
    lap = utils.laplacian_2d(10, 10) + 1.0 * sp.eye(100, format="csr")
    b = bvec[:100]
    A = ts.convert(ts.COO.from_scipy(lap.tocoo()), "csr")
    for res in (bicgstab(A, jnp.asarray(b), tol=1e-10, maxiter=2000),
                gmres(A, jnp.asarray(b), tol=1e-10, restart=30,
                      maxiter=2000)):
        _check(res, lap, b, 1e-10)
