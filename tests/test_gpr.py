"""GPR (gather-permute-reduce) general CSR SpMV: oracle tests across
pattern classes (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_spmv.kernels import gpr
from tpu_spmv import utils


def _check(mat, **kw):
    packed = gpr.pack_gpr(mat.astype(np.float32), **kw)
    x = jnp.asarray(np.random.default_rng(0).random(mat.shape[1]), jnp.float32)
    y = gpr.spmv_gpr(packed, x, interpret=True)
    ref = mat @ np.asarray(x, np.float64)
    denom = max(np.max(np.abs(ref)), 1e-30)
    rel = np.max(np.abs(np.asarray(y, np.float64) - ref)) / denom
    assert rel < 2e-5, rel
    return packed


CASES = {
    "random": lambda: utils.random_sparse(800, 700, 0.04, seed=95),
    "random_narrow": lambda: utils.random_sparse(4000, 4000, 8 / 4000,
                                                 seed=96),
    "power_law_hubs": lambda: utils.power_law(1500, 1500, 8, seed=97),
    "laplacian": lambda: utils.laplacian_2d(25, 25),
    "banded": lambda: utils.banded(2000, 6, seed=98),
    "rect_wide": lambda: utils.random_sparse(300, 2000, 0.02, seed=99),
    "rect_tall": lambda: utils.random_sparse(2000, 300, 0.02, seed=100),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_gpr_oracle(case):
    _check(CASES[case]())


def test_gpr_hub_spill():
    packed = _check(CASES["power_law_hubs"]())
    assert packed.side.nnz > 0


def test_gpr_nnz_cap():
    import scipy.sparse as sp

    n = gpr.MAX_NNZ + 10
    rows = np.arange(n, dtype=np.int64) // 1000
    cols = np.arange(n, dtype=np.int64) % 1000
    m = sp.coo_matrix((np.ones(n, dtype=np.float32), (rows, cols)),
                      shape=(int(rows[-1]) + 1, 1000)).tocsr()
    with pytest.raises(ValueError, match="chunk"):
        gpr.pack_gpr(m)


def test_gpr_supports():
    assert gpr.supports((1000, 1000), 50_000)
    assert not gpr.supports((1000, 5_000_000), 50_000)
    assert not gpr.supports((1000, 1000), 10**7)


def test_gpr_chunked():
    mat = utils.random_sparse(2500, 2000, 0.04, seed=101).astype(np.float32)
    A = gpr.pack_gpr_chunked(mat, chunk_nnz=50_000)
    assert len(A.chunks) >= 3
    x = jnp.asarray(np.random.default_rng(1).random(2000), jnp.float32)
    y = gpr.spmv_gpr_chunked(A, x, interpret=True)
    ref = mat @ np.asarray(x, np.float64)
    rel = np.max(np.abs(np.asarray(y, np.float64) - ref)) / np.max(np.abs(ref))
    assert rel < 2e-5


def test_gpr_chunked_single_chunk():
    mat = utils.laplacian_2d(15, 15).astype(np.float32)
    A = gpr.pack_gpr_chunked(mat)
    assert len(A.chunks) == 1
    x = jnp.asarray(np.random.default_rng(2).random(mat.shape[1]), jnp.float32)
    y = gpr.spmv_gpr_chunked(A, x, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y, np.float64), mat @ np.asarray(x, np.float64),
        rtol=2e-4, atol=1e-6,
    )
