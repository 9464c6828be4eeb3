"""DIA x DIA SpGEMM against the scipy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import tpu_spmv as ts
from tpu_spmv import utils
from tpu_spmv.ops.spgemm import spgemm


def _dia(m):
    return ts.convert(ts.COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")


def _check(A, B, mA, mB, tol=2e-5):
    C = spgemm(A, B)
    ref = (mA.astype(np.float64) @ mB.astype(np.float64)).toarray()
    got = np.zeros_like(ref)
    data = np.asarray(C.data, np.float64)
    n = C.shape[0]
    for d, off in enumerate(C.offsets):
        i = np.arange(max(0, -off), min(n, n - off))
        got[i, i + off] = data[d][i]
    denom = max(np.max(np.abs(ref)), 1e-30)
    assert np.max(np.abs(got - ref)) / denom < tol
    return C


def test_spgemm_laplacian_squared(rng):
    m = utils.laplacian_2d(12)
    A = _dia(m)
    C = _check(A, A, m, m)
    # A^2 of a 5-point stencil has 13 diagonals; result is usable as an
    # operand everywhere a DIA is (SpMV against the oracle)
    assert len(C.offsets) == 13
    x = rng.random(m.shape[0]).astype(np.float32)
    y = np.asarray(ts.spmv(C, jnp.asarray(x)), np.float64)
    ref = m.astype(np.float64) @ (m.astype(np.float64) @ x)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)
    # ... and the streaming kernel takes the assembled operand directly
    # (A^2 of a DIRICHLET operator is not strictly periodic — boundary
    # rows differ — so SDIA, not PSDIA, is the streaming target)
    from tpu_spmv.kernels import dia_stream

    S = dia_stream.pack_sdia(C)
    ys = np.asarray(dia_stream.spmv_sdia(S, jnp.asarray(x), interpret=True),
                    np.float64)
    np.testing.assert_allclose(ys, ref, rtol=1e-4, atol=1e-4)


def test_spgemm_different_bands(rng):
    mA = utils.banded(300, 2, seed=41)
    mB = utils.banded(300, 4, seed=42)
    _check(_dia(mA), _dia(mB), mA, mB)


def test_spgemm_composes_with_shift(rng):
    # (A + 2I)(A - 3I) assembled fully on device
    m = utils.laplacian_2d(10)
    A = _dia(m)
    left = ts.shift_diagonal(A, 2.0)
    right = ts.shift_diagonal(A, -3.0)
    I = sp.identity(m.shape[0])
    _check(left, right, (m + 2 * I).tocsr(), (m - 3 * I).tocsr())


def test_spgemm_routes_unstructured_to_csr_path():
    # non-DIA operands flow through spgemm_csr (round 4) instead of
    # raising: parity against the scipy product
    m = utils.laplacian_2d(8)
    csr = ts.convert(ts.COO.from_scipy(m.tocoo(), dtype=jnp.float64), "csr")
    C = spgemm(csr, csr)
    ref = (m @ m).tocsr()
    got = sp.csr_matrix(
        (np.asarray(C.data), np.asarray(C.indices),
         np.asarray(C.indptr)), shape=C.shape)
    assert abs(got - ref).max() < 1e-10


# ---------------------------------------------------------------------------
# general CSR x CSR (host symbolic + device numeric, round 4)
# ---------------------------------------------------------------------------

from tpu_spmv.ops.spgemm import spgemm_csr  # noqa: E402


def _csr_parity(A_sp, B_sp, tol=1e-10):
    C = spgemm_csr(A_sp, B_sp, dtype=jnp.float64)
    ref = (A_sp.astype(np.float64) @ B_sp.astype(np.float64)).tocsr()
    ref.sort_indices()
    got = sp.csr_matrix(
        (np.asarray(C.data), np.asarray(C.indices), np.asarray(C.indptr)),
        shape=C.shape)
    assert C.shape == ref.shape
    err = abs(got - ref)
    assert (err.max() if err.nnz else 0.0) < tol


@pytest.mark.parametrize("seed", [0, 1])
def test_spgemm_csr_random_square(seed):
    A = utils.random_sparse(300, 300, 0.02, seed=seed)
    B = utils.random_sparse(300, 300, 0.02, seed=seed + 10)
    _csr_parity(A.tocsr(), B.tocsr())


def test_spgemm_csr_rectangular():
    A = utils.random_sparse(200, 350, 0.03, seed=3)
    B = utils.random_sparse(350, 120, 0.03, seed=4)
    _csr_parity(A.tocsr(), B.tocsr())


def test_spgemm_csr_power_law():
    # hub columns: the expansion is skewed (the pattern class the
    # structured DIA path cannot touch)
    A = utils.power_law(400, 400, avg_nnz_per_row=6, seed=5)
    _csr_parity(A.tocsr(), A.tocsr())


def test_spgemm_csr_structural_zero():
    # disjoint supports: A's columns all < 100, B's rows all >= 100
    A = sp.csr_matrix((np.ones(5), (np.arange(5), np.arange(5))),
                      shape=(200, 200))
    B = sp.csr_matrix((np.ones(5), (np.arange(150, 155),
                                    np.arange(5))), shape=(200, 200))
    C = spgemm_csr(A, B)
    assert np.asarray(C.data).size == 0


def test_spgemm_csr_accepts_device_formats():
    m = utils.laplacian_2d(6)
    coo = ts.COO.from_scipy(m.tocoo(), dtype=jnp.float64)
    _csr_parity(m.tocsr(), m.tocsr())
    C = spgemm_csr(coo, coo, dtype=jnp.float64)
    ref = (m @ m).tocsr()
    got = sp.csr_matrix(
        (np.asarray(C.data), np.asarray(C.indices), np.asarray(C.indptr)),
        shape=C.shape)
    assert abs(got - ref).max() < 1e-10


def test_spgemm_csr_guards():
    A = utils.random_sparse(50, 60, 0.2, seed=1).tocsr()
    B = utils.random_sparse(61, 50, 0.2, seed=2).tocsr()
    with pytest.raises(ValueError, match="inner dimensions"):
        spgemm_csr(A, B)
    B2 = utils.random_sparse(60, 50, 0.5, seed=2).tocsr()
    with pytest.raises(ValueError, match="max_pairs"):
        spgemm_csr(A, B2, max_pairs=10)


def test_spgemm_csr_result_feeds_spmv(rng):
    # the product is a first-class CSR: it drives the SpMV dispatcher
    from tpu_spmv.ops.spmv import spmv

    A = utils.random_sparse(150, 150, 0.05, seed=7).tocsr()
    C = spgemm_csr(A, A, dtype=jnp.float64)
    x = rng.random(150)
    y = np.asarray(spmv(C, jnp.asarray(x)))
    ref = (A.astype(np.float64) @ A.astype(np.float64)) @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-10


def test_spgemm_structurally_zero_product():
    # nilpotent shift: every offset sum lands out of range — the product
    # is the zero matrix, returned in the empty-DIA convention
    import jax.numpy as jnp

    A = ts.DIA(data=jnp.ones((1, 4), jnp.float32), offsets=(3,),
               shape=(4, 4), nnz=1)
    C = spgemm(A, A)
    assert C.offsets == (0,) and C.nnz == 0
    assert not np.any(np.asarray(C.data))
