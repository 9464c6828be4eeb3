"""Strategy planner: pattern analysis + format choice + plan execution."""

import jax
import jax.numpy as jnp
import numpy as np

import tpu_spmv as ts
from tpu_spmv.ops.auto import analyze, plan_spmv
from tpu_spmv import utils


def test_analyze_laplacian():
    A = utils.laplacian_2d(10, 10)
    s = analyze(ts.COO.from_scipy(A))
    assert s.ndiags == 5
    assert s.max_row_nnz == 5
    assert s.nnz == A.nnz


def test_planner_picks_dia_for_banded():
    A = utils.banded(200, 3, seed=1)
    plan = plan_spmv(ts.COO.from_scipy(A))
    assert plan.strategy == "dia"
    assert isinstance(plan.matrix, ts.DIA)


def test_planner_picks_bdia_for_block_pde():
    A = utils.block_laplacian(6, bs=8, seed=2)
    plan = plan_spmv(ts.COO.from_scipy(A))
    assert plan.strategy == "bdia"
    assert isinstance(plan.matrix, ts.BDIA)


def test_planner_random_not_dia():
    A = utils.random_sparse(300, 300, 0.03, seed=3)
    plan = plan_spmv(ts.COO.from_scipy(A))
    assert plan.strategy in ("ell", "csr", "bsr")


def test_plan_executes_correctly(rng):
    for gen in (lambda: utils.laplacian_2d(9, 9),
                lambda: utils.block_laplacian(4, bs=4, seed=4),
                lambda: utils.random_sparse(150, 150, 0.05, seed=5)):
        mat = gen()
        plan = plan_spmv(ts.COO.from_scipy(mat))
        x = rng.standard_normal(mat.shape[1])
        y = jax.jit(lambda v: plan(v))(jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(y), mat @ x, rtol=1e-11, atol=1e-12,
            err_msg=plan.strategy,
        )


def test_plan_accumulate_semantics(rng):
    mat = utils.laplacian_2d(8, 8)
    plan = plan_spmv(ts.COO.from_scipy(mat))
    x = rng.standard_normal(mat.shape[1])
    y0 = rng.standard_normal(mat.shape[0])
    out = plan(jnp.asarray(x), jnp.asarray(y0))
    np.testing.assert_allclose(np.asarray(out), y0 + mat @ x, rtol=1e-11)


def test_empty_matrix_plan():
    coo = ts.COO.from_arrays([], [], [], (5, 5))
    plan = plan_spmv(coo)
    y = plan(jnp.ones(5))
    np.testing.assert_array_equal(np.asarray(y), np.zeros(5))
