"""Format-level transpose + LSQR against scipy/numpy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import tpu_spmv as ts
from tpu_spmv import utils
from tpu_spmv.ops import spmv, transpose
from tpu_spmv.ops.auto import plan_spmv
from tpu_spmv.solvers import lsqr


@pytest.fixture(scope="module")
def rect():
    # rectangular, genuinely asymmetric pattern
    return utils.random_sparse(120, 80, 0.08, seed=5).tocsr()


@pytest.mark.parametrize("fmt", ["coo", "csr", "csc", "dia"])
def test_transpose_oracle(fmt, rect):
    m = (rect if fmt != "dia"
         else sp.diags([np.arange(1, 91.0), -np.ones(89), 2 * np.ones(85)],
                       [0, 1, -5]).tocsr())
    A = ts.convert(ts.COO.from_scipy(m.tocoo()), fmt)
    At = transpose(A)
    assert At.shape == (m.shape[1], m.shape[0])
    x = np.random.default_rng(3).random(m.shape[0])
    y = spmv(At, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), m.T @ x, rtol=1e-10,
                               atol=1e-12)


def test_transpose_involution(rect):
    A = ts.convert(ts.COO.from_scipy(rect.tocoo()), "csr")
    Att = transpose(transpose(A))
    assert type(Att) is type(A) and Att.shape == A.shape
    np.testing.assert_array_equal(np.asarray(Att.data), np.asarray(A.data))


def test_transpose_unsupported_raises(rect):
    A = ts.convert(ts.COO.from_scipy(rect.tocoo()), "ell")
    with pytest.raises(TypeError, match="convert"):
        transpose(A)


def test_plan_transpose():
    # asymmetric banded matrix: plans to DIA, transposes in place
    n = 81
    m = sp.diags([np.arange(1.0, n + 1), -np.ones(n - 1),
                  2 * np.ones(n - 9)], [0, 1, -9]).tocsr()
    plan = plan_spmv(m)
    assert plan.strategy in ("dia", "csr", "csc", "coo")
    pt = plan.transpose()
    x = np.random.default_rng(11).random(81)
    np.testing.assert_allclose(np.asarray(pt(jnp.asarray(x))), m.T @ x,
                               rtol=1e-10, atol=1e-12)


def test_plan_transpose_unsupported():
    m = utils.random_sparse(600, 600, 0.01, seed=9)
    plan = plan_spmv(m, use_pallas=True)
    if plan.strategy in ("gpr", "pallas_ell"):
        with pytest.raises(TypeError, match="plan_spmv"):
            plan.transpose()


def test_lsqr_square(rect):
    lap = utils.laplacian_2d(9, 9)
    rng = np.random.default_rng(21)
    m = (lap + 3.0 * sp.eye(81, format="csr")
         + sp.random(81, 81, density=0.03, random_state=rng)).tocsr()
    b = rng.standard_normal(81)
    A = ts.convert(ts.COO.from_scipy(m.tocoo()), "csr")
    res = lsqr(A, jnp.asarray(b), tol=1e-12, maxiter=2000)
    assert bool(res.converged)
    x_ref = np.linalg.solve(m.toarray(), b)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-6,
                               atol=1e-8)


def test_lsqr_overdetermined(rect):
    # min ||Ax - b||: optimality is A^T r == 0, not r == 0
    rng = np.random.default_rng(22)
    b = rng.standard_normal(rect.shape[0])
    A = ts.convert(ts.COO.from_scipy(rect.tocoo()), "csr")
    res = lsqr(A, jnp.asarray(b), tol=1e-12, maxiter=3000)
    x_ref = np.linalg.lstsq(rect.toarray(), b, rcond=None)[0]
    r = b - rect @ np.asarray(res.x)
    r_ref = b - rect @ x_ref
    assert np.linalg.norm(r) <= np.linalg.norm(r_ref) * (1 + 1e-8)
    assert np.linalg.norm(rect.T @ r) <= 1e-6 * np.linalg.norm(b)


def test_lsqr_through_plan():
    m = (utils.laplacian_2d(8) + 2.0 * sp.eye(64, format="csr")).tocsr()
    b = np.random.default_rng(23).standard_normal(64)
    plan = plan_spmv(m)
    res = lsqr(plan, jnp.asarray(b), tol=1e-12, maxiter=1000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x),
                               np.linalg.solve(m.toarray(), b),
                               rtol=1e-6, atol=1e-8)


def test_lsqr_closure_needs_At():
    with pytest.raises(ValueError, match="At"):
        lsqr(lambda v: v, jnp.ones(4))
