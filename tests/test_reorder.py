"""RCM reordering: bandwidth reduction + correctness of permuted plans."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import tpu_spmv as ts
from tpu_spmv import reorder, utils


def _shuffled_banded(n=300, bw=4, seed=81):
    """A banded matrix with its structure hidden by a random permutation."""
    rng = np.random.default_rng(seed)
    A = utils.banded(n, bw, seed=seed)
    p = rng.permutation(n)
    return A[p][:, p].tocsr()


def test_rcm_reduces_bandwidth():
    A = _shuffled_banded()
    ro = reorder.reorder_plan(A)
    assert ro.bandwidth_before > 50          # shuffled: effectively dense band
    assert ro.bandwidth_after <= 3 * 4 + 2   # recovered locality
    assert ro.strategy.startswith("rcm+")


def test_rcm_unlocks_dia():
    """The planner on the shuffled matrix can't use DIA; after RCM it can."""
    from tpu_spmv.ops.auto import plan_spmv

    A = _shuffled_banded()
    direct = plan_spmv(ts.COO.from_scipy(A), use_pallas=False)
    assert direct.strategy != "dia"
    ro = reorder.reorder_plan(A, use_pallas=False)
    assert ro.plan.strategy == "dia"


def test_reordered_operator_correct(rng):
    A = _shuffled_banded()
    ro = reorder.reorder_plan(A)
    x = rng.standard_normal(A.shape[0])
    y = ro(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), A @ x, rtol=1e-10, atol=1e-12)
    # accumulate form
    y0 = rng.standard_normal(A.shape[0])
    out = ro(jnp.asarray(x), jnp.asarray(y0))
    np.testing.assert_allclose(np.asarray(out), y0 + A @ x, rtol=1e-10)


def test_permuted_space_usage(rng):
    """The recommended iterative-solver pattern: permute once."""
    A = _shuffled_banded()
    ro = reorder.reorder_plan(A)
    x = rng.standard_normal(A.shape[0])
    xp = jnp.asarray(x)[ro.perm]
    yp = ro.plan(xp)
    y = np.asarray(yp)[np.asarray(ro.inv_perm)]
    np.testing.assert_allclose(y, A @ x, rtol=1e-10, atol=1e-12)


def test_rcm_requires_square():
    A = utils.random_sparse(10, 20, 0.2, seed=82)
    with pytest.raises(ValueError, match="square"):
        reorder.rcm_permutation(A)


def test_bandwidth_helper():
    A = sp.csr_matrix(np.diag(np.ones(5)))
    assert reorder.bandwidth(A) == 0
    B = sp.csr_matrix(([1.0], ([0], [4])), shape=(5, 5))
    assert reorder.bandwidth(B) == 4
