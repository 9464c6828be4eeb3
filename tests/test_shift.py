"""shift_diagonal: A + c*I in-format, against the scipy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import tpu_spmv as ts
from tpu_spmv import utils
from tpu_spmv.kernels import dia_stream
from tpu_spmv.ops.shift import shift_diagonal


def _oracle(m, c, x):
    return (m.astype(np.float64) + c * sp.identity(m.shape[0])) @ x


@pytest.mark.parametrize("fmt", ["dia", "csr", "coo"])
def test_shift_formats(fmt, rng):
    m = utils.laplacian_2d(12)                       # has a full diagonal
    A = ts.convert(ts.COO.from_scipy(m.tocoo(), dtype=jnp.float32), fmt)
    As = shift_diagonal(A, 2.5)
    x = rng.random(m.shape[0]).astype(np.float32)
    y = np.asarray(ts.spmv(As, jnp.asarray(x)), np.float64)
    np.testing.assert_allclose(y, _oracle(m, 2.5, x), rtol=1e-5, atol=1e-5)


def test_shift_dia_missing_diagonal(rng):
    # strictly off-diagonal banded matrix: DIA gains a main diagonal row
    n = 64
    m = sp.diags([np.ones(n - 1), 2 * np.ones(n - 1)], [-1, 1]).tocsr()
    A = ts.convert(ts.COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    assert 0 not in A.offsets
    As = shift_diagonal(A, -1.5)
    assert 0 in As.offsets and As.offsets == tuple(sorted(As.offsets))
    x = rng.random(n).astype(np.float32)
    y = np.asarray(ts.spmv(As, jnp.asarray(x)), np.float64)
    np.testing.assert_allclose(y, _oracle(m, -1.5, x), rtol=1e-5, atol=1e-6)


def test_shift_csr_missing_diagonal_raises():
    n = 32
    m = sp.diags([np.ones(n - 1)], [1]).tocsr()
    A = ts.convert(ts.COO.from_scipy(m.tocoo(), dtype=jnp.float32), "csr")
    with pytest.raises(TypeError, match="diagonal entry per row"):
        shift_diagonal(A, 1.0)


def test_shift_sdia_and_psdia(rng):
    m = utils.laplacian_2d(16)
    dia = ts.convert(ts.COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    n = m.shape[0]
    x = rng.random(n).astype(np.float32)
    ref = _oracle(m, 3.0, x)

    S = dia_stream.pack_sdia(dia)
    Ss = shift_diagonal(S, 3.0)
    y = np.asarray(dia_stream.spmv_sdia(Ss, jnp.asarray(x), interpret=True),
                   np.float64)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)
    # pads must STAY structurally zero (kernel invariant)
    d0 = Ss.offsets.index(0)
    dd = np.asarray(Ss.data[d0])
    assert np.all(dd[:Ss.L] == 0) and np.all(dd[Ss.L + n:] == 0)

    P = dia_stream.pack_psdia(dia, period=16)
    Ps = shift_diagonal(P, 3.0)
    yp = np.asarray(
        dia_stream.spmv_psdia(Ps, jnp.asarray(x), interpret=True),
        np.float64)
    np.testing.assert_allclose(yp, ref, rtol=1e-5, atol=1e-5)


def test_shift_rectangular_raises():
    m = utils.random_sparse(30, 40, 0.2, seed=1)
    A = ts.convert(ts.COO.from_scipy(m.tocoo(), dtype=jnp.float32), "csr")
    with pytest.raises(ValueError, match="square"):
        shift_diagonal(A, 1.0)


def test_shift_sdia_missing_diagonal(rng):
    n = 256
    m = sp.diags([np.ones(n - 1), 2 * np.ones(n - 1)], [-1, 1]).tocsr()
    dia = ts.convert(ts.COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    S = dia_stream.pack_sdia(dia)
    assert 0 not in S.offsets
    Ss = shift_diagonal(S, 0.75)
    x = rng.random(n).astype(np.float32)
    y = np.asarray(dia_stream.spmv_sdia(Ss, jnp.asarray(x), interpret=True),
                   np.float64)
    np.testing.assert_allclose(y, _oracle(m, 0.75, x), rtol=1e-5, atol=1e-6)
