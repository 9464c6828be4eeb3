"""Randomized differential test: the planner's chosen kernel must match
the float64 scipy oracle across pattern classes, including degenerate
shapes (bounded seeds — a regression net, not a soak)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tpu_spmv import utils
from tpu_spmv.ops.auto import plan_spmv


def _cases():
    rng = np.random.default_rng(1234)
    yield "rect", sp.random(157, 211, 0.07, random_state=5, format="csr")
    yield "empty", sp.csr_matrix((7, 7))
    yield "identity", sp.identity(130, format="csr") * -2.5
    yield "grid", utils.laplacian_2d(17, 23)
    yield "band", utils.banded(700, 4, seed=8)
    yield "hubs", utils.power_law(900, 900, 7, seed=9)
    row = np.zeros(500, dtype=np.int64)
    yield "dense_row", sp.coo_matrix(
        (rng.standard_normal(500), (row, np.arange(500))),
        shape=(500, 500)).tocsr()
    yield "one_col", sp.coo_matrix(
        (rng.standard_normal(64), (np.arange(64), np.zeros(64, np.int64))),
        shape=(64, 64)).tocsr()


@pytest.mark.parametrize("name,mat", list(_cases()),
                         ids=[n for n, _ in _cases()])
@pytest.mark.parametrize("use_pallas", [False, True])
def test_planner_oracle_fuzz(name, mat, use_pallas, rng):
    mat = mat.astype(np.float32)
    plan = plan_spmv(mat, dtype=np.float32, use_pallas=use_pallas)
    x = rng.random(mat.shape[1]).astype(np.float32)
    y = np.asarray(plan(jnp.asarray(x)), np.float64)
    ref = mat.astype(np.float64) @ x.astype(np.float64)
    denom = max(float(np.max(np.abs(ref))), 1e-30)
    assert np.max(np.abs(y - ref)) / denom < 2e-4, plan.strategy
