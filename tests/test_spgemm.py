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


def test_spgemm_rejects_unstructured():
    m = utils.laplacian_2d(8)
    csr = ts.convert(ts.COO.from_scipy(m.tocoo(), dtype=jnp.float32), "csr")
    with pytest.raises(TypeError, match="DIA x DIA"):
        spgemm(csr, csr)


def test_spgemm_structurally_zero_product():
    # nilpotent shift: every offset sum lands out of range — the product
    # is the zero matrix, returned in the empty-DIA convention
    import jax.numpy as jnp

    A = ts.DIA(data=jnp.ones((1, 4), jnp.float32), offsets=(3,),
               shape=(4, 4), nnz=1)
    C = spgemm(A, A)
    assert C.offsets == (0,) and C.nnz == 0
    assert not np.any(np.asarray(C.data))
