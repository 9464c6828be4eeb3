"""Format construction, conversion round-trips, and dense parity.

Test strategy per SURVEY.md §4: scipy.sparse is the independent oracle for
every format and conversion (the reference has no tests at all).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import tpu_spmv as ts
from tpu_spmv import utils

FORMAT_NAMES = ["coo", "csr", "csc", "ell", "dia", "bsr", "bdia"]


def _cases():
    return {
        "random_square": utils.random_sparse(63, 63, 0.08, seed=1),
        "random_rect_tall": utils.random_sparse(97, 41, 0.06, seed=2),
        "random_rect_wide": utils.random_sparse(33, 118, 0.1, seed=3),
        "laplacian": utils.laplacian_2d(9, 7),
        "banded": utils.banded(50, 3, seed=4),
        "power_law": utils.power_law(80, 80, 5, seed=5),
        "single_entry": sp.csr_matrix(
            ([3.5], ([2], [4])), shape=(7, 9)
        ),
        "dense_small": sp.csr_matrix(np.arange(1, 13, dtype=float).reshape(3, 4)),
    }


@pytest.fixture(params=sorted(_cases()), ids=sorted(_cases()))
def case(request):
    return _cases()[request.param]


@pytest.mark.parametrize("fmt", FORMAT_NAMES)
def test_roundtrip_through_coo(case, fmt):
    """convert(A, fmt) → to_coo → dense equals the scipy dense."""
    coo = ts.COO.from_scipy(case)
    M = ts.convert(coo, fmt)
    dense = np.asarray(ts.to_coo(M).todense())
    np.testing.assert_allclose(dense, case.toarray(), rtol=0, atol=0)


@pytest.mark.parametrize("fmt", FORMAT_NAMES)
def test_todense_direct(case, fmt):
    M = ts.convert(ts.COO.from_scipy(case), fmt)
    np.testing.assert_allclose(np.asarray(M.todense()), case.toarray())


@pytest.mark.parametrize("src", FORMAT_NAMES)
@pytest.mark.parametrize("dst", FORMAT_NAMES)
def test_all_pairs_conversion(src, dst):
    """Any → any conversion preserves the matrix (reference only has the
    COO→{CSR,CSC,ELL}, CSR→DIA edges; we support the full graph)."""
    A = utils.random_sparse(29, 37, 0.12, seed=7)
    M = ts.convert(ts.COO.from_scipy(A), src)
    M2 = ts.convert(M, dst)
    np.testing.assert_allclose(np.asarray(M2.todense()), A.toarray())


def test_unsorted_coo_ingest():
    """COO entries in arbitrary order convert correctly (the reference's
    counting sort handles unsorted input; so must we)."""
    rng = np.random.default_rng(11)
    A = utils.random_sparse(40, 40, 0.1, seed=8).tocoo()
    perm = rng.permutation(A.nnz)
    coo = ts.COO.from_arrays(
        A.row[perm], A.col[perm], A.data[perm], A.shape, sort=False
    )
    assert not coo.rows_sorted
    for fmt in FORMAT_NAMES:
        M = ts.convert(coo, fmt)
        np.testing.assert_allclose(
            np.asarray(M.todense()), A.toarray(), err_msg=fmt
        )


def test_csr_diagonal_row_aligned():
    """Fix of reference quirk Q7: diagonal() is row-aligned with zeros for
    missing diagonal entries."""
    # row 1 has no diagonal entry
    dense = np.array([[2.0, 1.0, 0.0],
                      [4.0, 0.0, 5.0],
                      [0.0, 6.0, 7.0]])
    csr = ts.convert(ts.COO.from_dense(dense), "csr")
    np.testing.assert_allclose(np.asarray(csr.diagonal()), [2.0, 0.0, 7.0])


def test_csr_scipy_interop():
    A = utils.random_sparse(31, 27, 0.15, seed=9)
    csr = ts.CSR.from_scipy(A)
    back = csr.to_scipy()
    assert (back != A).nnz == 0


def test_ell_width_and_padding():
    A = utils.power_law(30, 30, 4, seed=10)
    ell = ts.convert(ts.COO.from_scipy(A), "ell")
    lengths = np.diff(A.indptr)
    assert ell.width == lengths.max()
    assert ell.nnz == A.nnz
    # padding slots are exact zeros so SpMV needs no mask
    mask = ~np.asarray(ell.valid)
    assert np.all(np.asarray(ell.data)[mask] == 0.0)


def test_dia_offsets_static_and_sorted():
    A = utils.banded(20, 2, seed=12)
    dia = ts.convert(ts.COO.from_scipy(A), "dia")
    assert isinstance(dia.offsets, tuple)
    assert list(dia.offsets) == sorted(dia.offsets)
    assert dia.ndiags == 5


@pytest.mark.parametrize("bs", [1, 2, 4, 8])
def test_bsr_block_sizes(bs):
    A = utils.laplacian_2d(6, 5)
    bsr = ts.convert(ts.COO.from_scipy(A), "bsr", block_size=bs)
    assert bsr.block_size == bs
    np.testing.assert_allclose(np.asarray(bsr.todense()), A.toarray())


def test_bsr_nonmultiple_shape():
    """Logical shape not divisible by block size: padded storage, exact
    logical semantics."""
    A = utils.random_sparse(13, 19, 0.2, seed=13)
    bsr = ts.convert(ts.COO.from_scipy(A), "bsr", block_size=4)
    assert bsr.shape == (13, 19)
    np.testing.assert_allclose(np.asarray(bsr.todense()), A.toarray())


def test_duplicate_coo_entries_accumulate():
    """Duplicate (i,j) pairs sum — matches scipy and the reference's
    accumulate-on-scatter semantics."""
    coo = ts.COO.from_arrays([0, 0, 1], [1, 1, 0], [2.0, 3.0, 4.0], (2, 2))
    dense = np.asarray(coo.todense())
    np.testing.assert_allclose(dense, [[0.0, 5.0], [4.0, 0.0]])


def test_formats_are_pytrees():
    """Formats must traverse jit boundaries: leaves are arrays, metadata is
    static (hashable)."""
    import jax

    A = ts.convert(ts.COO.from_scipy(utils.laplacian_2d(4)), "csr")
    leaves, treedef = jax.tree_util.tree_flatten(A)
    assert all(hasattr(l, "shape") for l in leaves)
    A2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert A2.shape == A.shape

    @jax.jit
    def scale2(mat):
        return mat.astype(mat.data.dtype)  # passes through jit

    out = scale2(A)
    assert out.shape == A.shape


def test_convert_errors():
    coo = ts.COO.from_dense(np.eye(3))
    with pytest.raises(ValueError, match="unknown format"):
        ts.convert(coo, "nope")
    with pytest.raises(ValueError):
        ts.COO.from_arrays([0], [5], [1.0], (2, 2))  # col out of range
    with pytest.raises(ValueError):
        ts.ELL.from_coo(ts.COO.from_dense(np.ones((2, 3))), width=1)
