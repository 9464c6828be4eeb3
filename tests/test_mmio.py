"""MatrixMarket I/O: banner validation, symmetry expansion, pattern files,
writers, vector I/O — the L1 layer (reference `/root/reference/src/mmio.cpp`,
`/root/reference/src/data_io.cpp`), including the Q9 fixes."""

import io

import numpy as np
import pytest

import tpu_spmv as ts
from tpu_spmv.io import mmio
from tpu_spmv import utils


def _mtx(text: str) -> io.StringIO:
    return io.StringIO(text.strip() + "\n")


def test_read_general_real():
    f = _mtx("""
%%MatrixMarket matrix coordinate real general
% a comment line
3 4 4
1 1 1.5
2 2 -2.5
3 4 3.0
1 3 0.5
""")
    coo = mmio.read_matrix(f)
    dense = np.zeros((3, 4))
    dense[0, 0], dense[1, 1], dense[2, 3], dense[0, 2] = 1.5, -2.5, 3.0, 0.5
    np.testing.assert_allclose(np.asarray(coo.todense()), dense)


def test_symmetric_expansion():
    """Q9 fix: stored lower triangle expands to the full matrix (the
    reference reads the triangle as-is, `/root/reference/src/data_io.cpp`)."""
    f = _mtx("""
%%MatrixMarket matrix coordinate real symmetric
3 3 4
1 1 2.0
2 1 -1.0
3 2 -1.0
3 3 2.0
""")
    coo = mmio.read_matrix(f)
    expect = np.array([[2.0, -1.0, 0.0],
                       [-1.0, 0.0, -1.0],
                       [0.0, -1.0, 2.0]])
    np.testing.assert_allclose(np.asarray(coo.todense()), expect)
    assert coo.nnz == 6  # off-diagonals doubled, diagonal not


def test_skew_symmetric_expansion():
    f = _mtx("""
%%MatrixMarket matrix coordinate real skew-symmetric
3 3 2
2 1 5.0
3 2 -2.0
""")
    coo = mmio.read_matrix(f)
    expect = np.array([[0.0, -5.0, 0.0],
                       [5.0, 0.0, 2.0],
                       [0.0, -2.0, 0.0]])
    np.testing.assert_allclose(np.asarray(coo.todense()), expect)


def test_pattern_file():
    """Q9 fix: pattern entries get unit values (the reference would misparse
    with an unconditional %lg scan)."""
    f = _mtx("""
%%MatrixMarket matrix coordinate pattern general
2 2 2
1 2
2 1
""")
    coo = mmio.read_matrix(f)
    np.testing.assert_allclose(
        np.asarray(coo.todense()), [[0.0, 1.0], [1.0, 0.0]]
    )


def test_pattern_symmetric():
    f = _mtx("""
%%MatrixMarket matrix coordinate pattern symmetric
3 3 2
2 1
3 3
""")
    coo = mmio.read_matrix(f)
    expect = np.array([[0, 1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(np.asarray(coo.todense()), expect)


def test_integer_field():
    f = _mtx("""
%%MatrixMarket matrix coordinate integer general
2 2 2
1 1 3
2 2 -4
""")
    coo = mmio.read_matrix(f)
    np.testing.assert_allclose(np.asarray(coo.todense()), [[3, 0], [0, -4.0]])


def test_array_format():
    f = _mtx("""
%%MatrixMarket matrix array real general
2 3
1.0
2.0
3.0
4.0
5.0
6.0
""")
    row, col, val, shape = mmio.read_mtx_arrays(f)
    dense = np.zeros(shape)
    dense[row, col] = val
    # array files are column-major
    np.testing.assert_allclose(dense, [[1.0, 3.0, 5.0], [2.0, 4.0, 6.0]])


def test_complex_rejected():
    """Parity with /root/reference/src/data_io.cpp:66-71."""
    f = _mtx("""
%%MatrixMarket matrix coordinate complex general
1 1 1
1 1 1.0 2.0
""")
    with pytest.raises(ValueError, match="complex"):
        mmio.read_matrix(f)


@pytest.mark.parametrize("bad,msg", [
    ("%%NotMatrixMarket matrix coordinate real general\n1 1 1\n1 1 1.0",
     "banner"),
    ("%%MatrixMarket tensor coordinate real general\n1 1 1\n1 1 1.0",
     "object"),
    ("%%MatrixMarket matrix coordinate real weird\n1 1 1\n1 1 1.0",
     "symmetry"),
    ("%%MatrixMarket matrix coordinate real general\n1 1\n", "size line"),
    ("%%MatrixMarket matrix coordinate real general\n2 2 1\n3 1 1.0",
     "bounds"),
    ("%%MatrixMarket matrix coordinate real general\n2 2 2\n1 1 1.0",
     "tokens"),
])
def test_malformed_inputs(bad, msg):
    with pytest.raises(ValueError, match=msg):
        mmio.read_matrix(_mtx(bad))


def test_write_read_roundtrip(tmp_path):
    A = utils.random_sparse(25, 31, 0.1, seed=51)
    coo = ts.COO.from_scipy(A)
    path = tmp_path / "out.mtx"
    mmio.write_matrix(path, coo, comment="roundtrip fixture")
    back = mmio.read_matrix(path)
    np.testing.assert_allclose(
        np.asarray(back.todense()), A.toarray(), rtol=0, atol=0
    )


def test_gzip_roundtrip(tmp_path):
    A = utils.laplacian_2d(5, 4)
    path = tmp_path / "out.mtx.gz"
    mmio.write_matrix(path, ts.COO.from_scipy(A))
    back = mmio.read_matrix(path)
    np.testing.assert_allclose(np.asarray(back.todense()), A.toarray())


def test_vector_io_roundtrip(tmp_path):
    """Reference plain-text vector format
    (`/root/reference/src/data_io.cpp:10-40`)."""
    v = np.array([1.5, -2.25, 1e-17, 3.0])
    path = tmp_path / "vec.txt"
    mmio.write_dense(path, v)
    back = mmio.read_dense(path)
    np.testing.assert_allclose(back, v, rtol=0, atol=0)


def test_vector_io_bad_count(tmp_path):
    path = tmp_path / "vec.txt"
    path.write_text("3\n1.0\n2.0\n")
    with pytest.raises(ValueError, match="declares 3"):
        mmio.read_dense(path)
