"""SpMV / SpMM correctness vs the float64 scipy oracle, all formats.

Covers the reference's kernel surface (`/root/reference/src/mat_vec.cpp`)
including its accumulate (`y += Ax``) semantics, plus SpMM (BASELINE
config 3) and determinism (the TPU replacement for race-freedom checks,
SURVEY.md §5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_spmv as ts
from tpu_spmv import utils

FORMAT_NAMES = ["coo", "csr", "csc", "ell", "dia", "bsr", "bdia"]

CASES = {
    "random_square": lambda: utils.random_sparse(120, 120, 0.05, seed=21),
    "rect_tall": lambda: utils.random_sparse(150, 60, 0.07, seed=22),
    "rect_wide": lambda: utils.random_sparse(60, 150, 0.07, seed=23),
    "laplacian": lambda: utils.laplacian_2d(12, 10),
    "banded": lambda: utils.banded(90, 4, seed=24),
    "power_law": lambda: utils.power_law(100, 100, 6, seed=25),
}


@pytest.fixture(params=sorted(CASES), ids=sorted(CASES))
def mat(request):
    return CASES[request.param]()


@pytest.mark.parametrize("fmt", FORMAT_NAMES)
def test_spmv_oracle(mat, fmt, rng):
    A = ts.convert(ts.COO.from_scipy(mat), fmt)
    x = rng.standard_normal(mat.shape[1])
    y = ts.spmv(A, jnp.asarray(x))
    y_ref = mat @ x
    denom = max(np.max(np.abs(y_ref)), 1e-300)
    assert np.max(np.abs(np.asarray(y) - y_ref)) / denom < 1e-12, fmt


@pytest.mark.parametrize("fmt", FORMAT_NAMES)
def test_spmv_accumulate(mat, fmt, rng):
    """Reference semantics: y += Ax (SURVEY.md Q2),
    `/root/reference/src/mat_vec.cpp:39,64,91,116,142`."""
    A = ts.convert(ts.COO.from_scipy(mat), fmt)
    x = rng.standard_normal(mat.shape[1])
    y0 = rng.standard_normal(mat.shape[0])
    y = ts.spmv(A, jnp.asarray(x), y=jnp.asarray(y0))
    np.testing.assert_allclose(np.asarray(y), y0 + mat @ x, rtol=1e-12)


@pytest.mark.parametrize("fmt", FORMAT_NAMES)
def test_spmv_under_jit(mat, fmt, rng):
    A = ts.convert(ts.COO.from_scipy(mat), fmt)
    x = jnp.asarray(rng.standard_normal(mat.shape[1]))
    jitted = jax.jit(ts.spmv)
    # jit may refuse/fuse differently (float associativity) — tiny slack
    np.testing.assert_allclose(
        np.asarray(jitted(A, x)), np.asarray(ts.spmv(A, x)),
        rtol=1e-12, atol=1e-13,
    )


@pytest.mark.parametrize("fmt", FORMAT_NAMES)
@pytest.mark.parametrize("nrhs", [1, 32])
def test_spmm_oracle(fmt, nrhs, rng):
    """BASELINE config 3: multi-RHS SpMM (32 RHS)."""
    mat = utils.random_sparse(90, 70, 0.08, seed=31)
    A = ts.convert(ts.COO.from_scipy(mat), fmt)
    X = rng.standard_normal((70, nrhs))
    Y = ts.spmm(A, jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(Y), mat @ X, rtol=1e-11, atol=1e-12)


@pytest.mark.parametrize("fmt", FORMAT_NAMES)
def test_determinism(fmt, rng):
    """Same input → bitwise-same output.  The TPU analog of the reference's
    race handling (`#pragma omp atomic`): XLA segment reductions are
    deterministic by construction (SURVEY.md §5)."""
    mat = utils.power_law(80, 80, 6, seed=41)
    A = ts.convert(ts.COO.from_scipy(mat), fmt)
    x = jnp.asarray(rng.standard_normal(80))
    fn = jax.jit(ts.spmv)
    y1 = np.asarray(fn(A, x))
    y2 = np.asarray(fn(A, x))
    assert np.array_equal(y1, y2)


def test_empty_rows_and_cols(rng):
    """Rows/cols with no entries: y entries must be exactly 0, not garbage."""
    dense = np.zeros((6, 5))
    dense[0, 1] = 2.0
    dense[4, 3] = -1.5
    for fmt in FORMAT_NAMES:
        A = ts.convert(ts.COO.from_dense(dense), fmt)
        x = rng.standard_normal(5)
        y = np.asarray(ts.spmv(A, jnp.asarray(x)))
        np.testing.assert_allclose(y, dense @ x, atol=1e-14, err_msg=fmt)
        assert y[1] == 0.0 and y[2] == 0.0


def test_float32_path(rng):
    """f32 compute with f64 oracle at a loosened gate (BASELINE dtype
    policy: f64 for correctness runs, f32 for roofline runs)."""
    mat = utils.laplacian_2d(16, 16)
    x = rng.standard_normal(mat.shape[1])
    for fmt in FORMAT_NAMES:
        A = ts.convert(ts.COO.from_scipy(mat), fmt).astype(jnp.float32)
        y = ts.spmv(A, jnp.asarray(x, dtype=jnp.float32))
        assert y.dtype == jnp.float32
        denom = np.max(np.abs(mat @ x))
        rel = np.max(np.abs(np.asarray(y, dtype=np.float64) - mat @ x)) / denom
        assert rel < 1e-5, (fmt, rel)


def test_spmv_rejects_unknown_type():
    with pytest.raises(TypeError):
        ts.spmv(np.eye(3), np.ones(3))
