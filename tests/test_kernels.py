"""Pallas kernel tests (interpreter mode on CPU; real-chip runs happen in
the bench).  Oracle: scipy float64, loosened gate for f32 kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_spmv as ts
from tpu_spmv.kernels import ell_pallas
from tpu_spmv import utils


def _check(mat, *, rtol=2e-5):
    coo = ts.COO.from_scipy(mat.tocoo()).astype(jnp.float32)
    ell = ts.convert(coo, "ell")
    packed = ell_pallas.pack_ell(ell)
    x = jnp.asarray(np.random.default_rng(0).random(mat.shape[1]), jnp.float32)
    y = ell_pallas.spmv_pallas(packed, x, interpret=True)
    ref = mat @ np.asarray(x, np.float64)
    denom = max(np.max(np.abs(ref)), 1e-30)
    rel = np.max(np.abs(np.asarray(y, np.float64) - ref)) / denom
    assert rel < rtol, rel
    return packed


CASES = {
    "laplacian": lambda: utils.laplacian_2d(20, 20),
    "laplacian_rect": lambda: utils.laplacian_2d(17, 11),
    "random_square": lambda: utils.random_sparse(400, 400, 0.02, seed=11),
    "random_rect": lambda: utils.random_sparse(300, 500, 0.03, seed=12),
    "banded": lambda: utils.banded(600, 5, seed=13),
    "many_segments": lambda: utils.random_sparse(128, 3000, 0.02, seed=14),
    "single_entry": lambda: __import__("scipy.sparse", fromlist=["x"])
        .csr_matrix(([2.5], ([3], [200])), shape=(10, 300)),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_pallas_ell_oracle(case):
    _check(CASES[case]())


def test_multi_round_packing():
    """Columns spanning many 128-segments per row → multiple gather rounds."""
    mat = utils.random_sparse(64, 2000, 0.01, seed=15)
    packed = _check(mat)
    assert packed.rounds >= 2


def test_wide_rows_spill_to_side():
    """Rows wider than the lane budget spill into the COO side matrix and
    still produce exact results (hub rows of power-law graphs)."""
    mat = utils.power_law(200, 200, 8, seed=16)
    assert mat.indptr[1:][np.argmax(np.diff(mat.indptr))] > 0
    packed = _check(mat)
    # either everything fits or the side matrix carries the overflow
    assert packed.side.nnz + np.count_nonzero(np.asarray(packed.vals)) >= 0


def test_dense_row_spills():
    import scipy.sparse as sp

    dense_row = np.zeros((4, 600))
    dense_row[1, :] = 1.0     # width 600 >> 128
    dense_row[2, 5] = 3.0
    packed = _check(sp.csr_matrix(dense_row))
    assert packed.side.nnz > 0


def test_supports_envelope():
    ok = ts.convert(ts.COO.from_scipy(utils.laplacian_2d(8)), "csr")
    assert ell_pallas.supports(ok)
    assert not ell_pallas.supports(np.eye(3))


def test_k_choice_local_matrix():
    """Banded matrices should pack multiple rows per sublane (small W)."""
    mat = utils.banded(2048, 3, seed=17)
    packed = ell_pallas.pack_ell(
        ts.convert(ts.COO.from_scipy(mat), "csr").astype(jnp.float32))
    assert packed.rows_per_sublane >= 8
    assert packed.rounds <= 8


def test_pack_from_csr_directly():
    mat = utils.banded(100, 3, seed=17)
    csr = ts.convert(ts.COO.from_scipy(mat), "csr").astype(jnp.float32)
    packed = ell_pallas.pack_ell(csr)
    x = jnp.asarray(np.random.default_rng(1).random(100), jnp.float32)
    y = ell_pallas.spmv_pallas(packed, x, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y, np.float64), mat @ np.asarray(x, np.float64),
        rtol=2e-5, atol=1e-6,
    )


def test_spmm_pallas(rng):
    mat = utils.banded(300, 4, seed=18)
    packed = ell_pallas.pack_ell(mat.astype(np.float32))
    X = jnp.asarray(rng.standard_normal((300, 5)), jnp.float32)
    Y = ell_pallas.spmm_pallas(packed, X, interpret=True)
    np.testing.assert_allclose(
        np.asarray(Y, np.float64), mat @ np.asarray(X, np.float64),
        rtol=2e-4, atol=1e-5,
    )


def test_packed_to_coo_roundtrip():
    mat = utils.random_sparse(150, 400, 0.04, seed=19)
    packed = ell_pallas.pack_ell(mat.astype(np.float32))
    back = packed.to_coo().to_scipy().toarray()
    np.testing.assert_allclose(back, mat.toarray(), rtol=1e-6, atol=1e-7)


def test_planner_uses_pallas_for_irregular():
    from tpu_spmv.ops.auto import plan_spmv

    mat = utils.random_sparse(256, 256, 0.05, seed=20)
    coo = ts.COO.from_scipy(mat).astype(jnp.float32)
    plan = plan_spmv(coo, use_pallas=True)
    assert plan.strategy == "pallas_ell"
    x = jnp.asarray(np.random.default_rng(2).random(256), jnp.float32)
    y = plan(x)
    ref = mat @ np.asarray(x, np.float64)
    assert np.max(np.abs(np.asarray(y, np.float64) - ref)) / np.max(
        np.abs(ref)) < 2e-5
