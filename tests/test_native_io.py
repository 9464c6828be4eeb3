"""Native (C++) mmio parser: parity with the pure-Python parser.

Skipped when ``native/libmmio_fast.so`` hasn't been built
(``make -C native``); CI for this repo builds it first.
"""

import io

import numpy as np
import pytest

import tpu_spmv as ts
from tpu_spmv.io import mmio, native
from tpu_spmv import utils

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native mmio library not built"
)


def _roundtrip_file(tmp_path, mat, name="m.mtx"):
    path = tmp_path / name
    mmio.write_matrix(path, ts.COO.from_scipy(mat))
    return path


@pytest.mark.parametrize("gen", [
    lambda: utils.random_sparse(60, 45, 0.1, seed=71),
    lambda: utils.laplacian_2d(7, 6),
    lambda: utils.banded(40, 2, seed=72),
])
def test_native_matches_python(tmp_path, gen):
    path = _roundtrip_file(tmp_path, gen())
    r1, c1, v1, s1 = mmio.read_mtx_arrays(path, use_native=True)
    r2, c2, v2, s2 = mmio.read_mtx_arrays(path, use_native=False)
    assert s1 == s2
    o1 = np.lexsort((c1, r1))
    o2 = np.lexsort((c2, r2))
    np.testing.assert_array_equal(r1[o1], r2[o2])
    np.testing.assert_array_equal(c1[o1], c2[o2])
    np.testing.assert_allclose(v1[o1], v2[o2])


def test_native_symmetric_expansion(tmp_path):
    path = tmp_path / "sym.mtx"
    path.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "3 3 4\n1 1 2.0\n2 1 -1.0\n3 2 -1.5\n3 3 2.0\n"
    )
    r, c, v, shape = mmio.read_mtx_arrays(path, use_native=True)
    dense = np.zeros(shape)
    dense[r, c] = v
    np.testing.assert_allclose(dense, dense.T)
    assert dense[0, 1] == -1.0 and dense[1, 2] == -1.5


def test_native_pattern(tmp_path):
    path = tmp_path / "pat.mtx"
    path.write_text(
        "%%MatrixMarket matrix coordinate pattern general\n"
        "2 3 2\n1 3\n2 1\n"
    )
    r, c, v, shape = mmio.read_mtx_arrays(path, use_native=True)
    assert shape == (2, 3)
    np.testing.assert_allclose(v, [1.0, 1.0])


def test_native_exponent_and_fortran_forms(tmp_path):
    path = tmp_path / "exp.mtx"
    path.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "2 2 3\n1 1 1.5e-3\n2 2 -2.25D+2\n1 2 .5\n"
    )
    r, c, v, shape = mmio.read_mtx_arrays(path, use_native=True)
    order = np.lexsort((c, r))
    np.testing.assert_allclose(v[order], [1.5e-3, 0.5, -225.0])


def test_native_errors(tmp_path):
    missing = tmp_path / "nope.mtx"
    with pytest.raises(ValueError, match="open failed"):
        native.read_mtx_arrays_native(missing)
    bad = tmp_path / "bad.mtx"
    bad.write_text("not a matrix\n")
    with pytest.raises(ValueError, match="not a MatrixMarket"):
        native.read_mtx_arrays_native(bad)
    oob = tmp_path / "oob.mtx"
    oob.write_text(
        "%%MatrixMarket matrix coordinate real general\n2 2 1\n3 1 1.0\n"
    )
    with pytest.raises(ValueError, match="bounds"):
        mmio.read_mtx_arrays(oob, use_native=True)


def test_native_large_parity(tmp_path):
    """A bigger file exercises the OpenMP chunked path."""
    mat = utils.random_sparse(2000, 2000, 0.02, seed=73)  # ~80k nnz
    path = _roundtrip_file(tmp_path, mat, "big.mtx")
    r, c, v, shape = mmio.read_mtx_arrays(path, use_native=True)
    back = np.zeros(shape)
    back[r, c] = v
    np.testing.assert_allclose(back, mat.toarray())
