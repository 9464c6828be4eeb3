"""Planned distributed SpMV: fast local kernels (DIA/BDIA shifted FMAs)
inside shard_map, plus the column-split reduce-scatter strategy — on the
8-virtual-device CPU mesh (VERDICT r1 items 1 and 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_spmv as ts
from tpu_spmv import dist, utils
from tpu_spmv.formats import COO, convert


@pytest.fixture(scope="module")
def mesh():
    return dist.make_mesh(8)


def _global_spmv(plan, mesh, mat, x):
    xs = plan.shard_x(x, dtype=np.float32)
    y = plan.spmv(mesh, xs)
    return plan.y_to_global(y)


def _ref(mat, x):
    return mat.astype(np.float64) @ x.astype(np.float64)


def _assert_close(y, ref):
    rel = np.max(np.abs(np.asarray(y, np.float64) - ref)) / max(
        np.max(np.abs(ref)), 1e-300)
    assert rel < 2e-5, rel


def test_plan_dist_picks_dia(mesh, rng):
    mat = utils.laplacian_2d(24, 24)          # 5-diagonal, square
    plan = dist.plan_dist_spmv(mat, 8, dtype=np.float32)
    assert plan.strategy == "dia"
    x = rng.random(mat.shape[1]).astype(np.float32)
    _assert_close(_global_spmv(plan, mesh, mat, x), _ref(mat, x))


def test_plan_dist_picks_bdia(mesh, rng):
    mat = utils.block_laplacian(12, bs=8, seed=2)
    plan = dist.plan_dist_spmv(mat, 8, dtype=np.float32)
    assert plan.strategy == "bdia"
    x = rng.random(mat.shape[1]).astype(np.float32)
    _assert_close(_global_spmv(plan, mesh, mat, x), _ref(mat, x))


def test_plan_dist_general_picks_gpr(mesh, rng):
    # general patterns get the fast GPR local kernel (VERDICT r1 item 1:
    # "GPR for general ones, pack each shard's buckets at build time")
    mat = utils.random_sparse(300, 300, 0.03, seed=3)
    plan = dist.plan_dist_spmv(mat, 8, dtype=np.float32)
    assert plan.strategy == "gpr"
    x = rng.random(mat.shape[1]).astype(np.float32)
    _assert_close(_global_spmv(plan, mesh, mat, x), _ref(mat, x))


def test_plan_dist_csr_halo_fallback(mesh, rng):
    # forcing the bucketed ring still works (and is the fallback when the
    # GPR envelope is exceeded)
    mat = utils.random_sparse(300, 300, 0.03, seed=3)
    plan = dist.plan_dist_spmv(mat, 8, dtype=np.float32,
                               strategy="csr_halo")
    assert plan.strategy == "csr_halo"
    x = rng.random(mat.shape[1]).astype(np.float32)
    _assert_close(_global_spmv(plan, mesh, mat, x), _ref(mat, x))


def test_sharded_gpr_power_law(mesh, rng):
    # hub rows (>128 nnz) exercise the shape-forced side path per shard
    mat = utils.power_law(650, 650, 7, seed=6).tocsr()
    mat.sort_indices()
    plan = dist.plan_dist_spmv(mat, 8, dtype=np.float32, strategy="gpr")
    x = rng.random(mat.shape[1]).astype(np.float32)
    _assert_close(_global_spmv(plan, mesh, mat, x), _ref(mat, x))


def test_sharded_dia_one_device(rng):
    # ndev=1 must degenerate to the single-chip DIA kernel exactly
    mesh1 = dist.make_mesh(1)
    mat = utils.banded(200, 4, seed=4)
    plan = dist.plan_dist_spmv(mat, 1, dtype=np.float32, strategy="dia")
    x = rng.random(mat.shape[1]).astype(np.float32)
    y = _global_spmv(plan, mesh1, mat, x)
    _assert_close(y, _ref(mat, x))
    # and match the non-distributed DIA kernel bit-for-bit
    dia = convert(COO.from_scipy(mat.tocoo(), dtype=jnp.float32), "dia")
    y1 = ts.spmv(dia, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y1), rtol=1e-6)


def test_sharded_dia_band_too_wide():
    # band wider than the chunk: 1-hop halo cannot cover it
    mat = utils.banded(64, 40, seed=5)
    dia = convert(COO.from_scipy(mat.tocoo(), dtype=jnp.float32), "dia")
    with pytest.raises(ValueError, match="band"):
        dist.ShardedDIA.build(dia, 8)


def test_sharded_dia_nonuniform_tail(mesh, rng):
    # nrow not divisible by ndev: last shard is zero-padded
    mat = utils.banded(203, 3, seed=6)
    plan = dist.plan_dist_spmv(mat, 8, dtype=np.float32, strategy="dia")
    x = rng.random(203).astype(np.float32)
    _assert_close(_global_spmv(plan, mesh, mat, x), _ref(mat, x))


def test_colsplit_matches_oracle(mesh, rng):
    # the CSC-NUMA analog WITH the reduction the reference forgot (Q5)
    for gen, kw in [(utils.random_sparse, dict(seed=7)),
                    (utils.power_law, dict(seed=8))]:
        mat = (utils.random_sparse(300, 280, 0.03, seed=7)
               if gen is utils.random_sparse
               else utils.power_law(257, 300, 7, seed=8))
        csr = convert(COO.from_scipy(mat.tocoo(), dtype=jnp.float32), "csr")
        A = dist.ColShardedCSR.build(csr, 8)
        x = rng.random(mat.shape[1]).astype(np.float32)
        xs = dist.ShardedVector.from_global(x, A.col_plan)
        y = dist.spmv_colsplit(mesh, A, xs)
        _assert_close(y.to_global(), _ref(mat, x))


def test_colsplit_nnz_balance():
    mat = utils.power_law(500, 500, 9, seed=9).T.tocsr()  # column-skewed
    csr = convert(COO.from_scipy(mat.tocoo()), "csr")
    A = dist.ColShardedCSR.build(csr, 8, balance="nnz")
    # nnz-balanced columns: no shard over 2x mean
    counts = np.asarray([(np.asarray(A.data[i]) != 0).sum()
                         for i in range(8)])
    assert counts.max() <= max(2.0 * mat.nnz / 8, 64)


def test_bench_dist_spmv(mesh, capsys):
    from tpu_spmv.dist.planned import bench_dist_spmv

    mat = utils.laplacian_2d(16, 16)
    r = bench_dist_spmv(mat, mesh, dtype=np.float32, iters=3)
    assert r["strategy"] == "dia"
    assert r["rel_err"] < 2e-5
    assert r["gflops"] > 0
    out = capsys.readouterr().out
    assert "### CSR DIST8 GFLOPS" in out


def test_sdia_sharded_oracle(mesh, rng):
    # the streaming-DIA local kernel inside shard_map (ring tile halo)
    mat = utils.banded(5000, 6, seed=31)
    plan = dist.plan_dist_spmv(mat, 8, dtype=np.float32,
                               strategy="dia_stream", sdia_rb=256)
    assert plan.strategy == "dia_stream"
    x = rng.random(mat.shape[1]).astype(np.float32)
    _assert_close(_global_spmv(plan, mesh, mat, x), _ref(mat, x))


def test_sdia_sharded_chainable(mesh, rng):
    # y chunks share the padded x layout, so distributed chains close
    mat = utils.laplacian_2d(40, 40)
    plan = dist.plan_dist_spmv(mat, 8, dtype=np.float32,
                               strategy="dia_stream", sdia_rb=256)
    x = rng.random(mat.shape[1]).astype(np.float32)
    xs = plan.shard_x(x, dtype=np.float32)
    y1 = plan.spmv(mesh, xs)
    y2 = plan.spmv(mesh, y1)           # feed y straight back in
    ref = mat.astype(np.float64) @ (mat.astype(np.float64) @ x)
    _assert_close(plan.y_to_global(y2), ref)


def test_psdia_sharded_oracle(mesh, rng):
    # the PERIODIC streaming local kernel inside shard_map: pattern
    # replicated, row mask with the shard-global origin (SMEM scalar)
    mat = utils.laplacian_2d(64, 64)          # period 64, n=4096
    plan = dist.plan_dist_spmv(mat, 8, dtype=np.float32,
                               strategy="pdia_stream", sdia_rb=256)
    assert plan.strategy == "pdia_stream"
    assert isinstance(plan.matrix, dist.ShardedPSDIA)
    assert plan.matrix.period == 64
    x = rng.random(mat.shape[1]).astype(np.float32)
    _assert_close(_global_spmv(plan, mesh, mat, x), _ref(mat, x))


def test_psdia_sharded_chainable(mesh, rng):
    mat = utils.laplacian_2d(32, 32)
    plan = dist.plan_dist_spmv(mat, 8, dtype=np.float32,
                               strategy="pdia_stream", sdia_rb=256)
    x = rng.random(mat.shape[1]).astype(np.float32)
    xs = plan.shard_x(x, dtype=np.float32)
    y1 = plan.spmv(mesh, xs)
    y2 = plan.spmv(mesh, y1)
    ref = mat.astype(np.float64) @ (mat.astype(np.float64) @ x)
    _assert_close(plan.y_to_global(y2), ref)


def test_psdia_sharded_rejects_nonperiodic():
    import pytest as _pytest

    mat = utils.banded(3000, 4, seed=33)      # random band: not periodic
    with _pytest.raises(ValueError, match="periodic"):
        dist.plan_dist_spmv(mat, 8, dtype=np.float32,
                            strategy="pdia_stream", sdia_rb=256)


def test_sdia_sharded_dead_output_matches(mesh, rng):
    # the zero-copy chaining hook through shard_map: a donated ShardedVector
    # aliased to the per-shard output must not change any result
    import jax

    mat = utils.laplacian_2d(40, 40)
    plan = dist.plan_dist_spmv(mat, 8, dtype=np.float32,
                               strategy="dia_stream", sdia_rb=256)
    from tpu_spmv.dist.planned import spmv_sdia_sharded

    x = rng.random(mat.shape[1]).astype(np.float32)
    xs = plan.shard_x(x, dtype=np.float32)
    y_plain = spmv_sdia_sharded(mesh, plan.matrix, xs, interpret=True)
    dead = jax.tree_util.tree_map(jnp.zeros_like, xs)
    y_dead = spmv_sdia_sharded(mesh, plan.matrix, xs, interpret=True,
                               dead=dead)
    np.testing.assert_array_equal(np.asarray(y_plain.chunks),
                                  np.asarray(y_dead.chunks))


def test_psdia_sharded_dead_output_matches(mesh, rng):
    import jax

    mat = utils.laplacian_2d(32, 32)     # period 32 divides rb=256
    plan = dist.plan_dist_spmv(mat, 8, dtype=np.float32,
                               strategy="pdia_stream", sdia_rb=256)
    from tpu_spmv.dist.planned import spmv_psdia_sharded

    x = rng.random(mat.shape[1]).astype(np.float32)
    xs = plan.shard_x(x, dtype=np.float32)
    y_plain = spmv_psdia_sharded(mesh, plan.matrix, xs, interpret=True)
    dead = jax.tree_util.tree_map(jnp.zeros_like, xs)
    y_dead = spmv_psdia_sharded(mesh, plan.matrix, xs, interpret=True,
                                dead=dead)
    np.testing.assert_array_equal(np.asarray(y_plain.chunks),
                                  np.asarray(y_dead.chunks))


def test_sdia_sharded_bf16_data(mesh, rng):
    # mixed precision distributed: bf16-stored diagonals, f32 vectors —
    # output must promote to f32 (crashed at trace time before r3's
    # ring-runner dtype fix: 'Invalid dtype for swap')
    from tpu_spmv.dist.planned import ShardedSDIA, spmv_sdia_sharded
    from tpu_spmv.kernels import dia_stream
    from tpu_spmv import COO, convert

    mat = utils.laplacian_2d(32, 32)
    dia = convert(COO.from_scipy(mat.tocoo(), dtype=jnp.float32), "dia")
    S = dia_stream.pack_sdia(dia, rb=256, data_dtype=jnp.bfloat16)
    A = ShardedSDIA.build(S, 8)
    x = rng.random(mat.shape[1]).astype(np.float32)
    xs = A.shard_xpad(dia_stream.pad_x(S, jnp.asarray(x)))
    y = spmv_sdia_sharded(mesh, A, xs, interpret=True)
    assert y.chunks.dtype == jnp.float32
    yg = np.asarray(y.chunks).reshape(-1)[S.L:S.L + mat.shape[0]]
    ref = mat.astype(np.float64) @ x.astype(np.float64)
    rel = np.max(np.abs(yg - ref)) / np.max(np.abs(ref))
    assert rel < 2e-2, rel        # bf16 coefficient rounding budget
