"""Distribution layer tests on an 8-virtual-device CPU mesh (SURVEY.md §4:
the fake-backend capability the reference lacks — its NUMA code can only be
validated on a real NUMA box; our sharded code runs anywhere)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_spmv as ts
from tpu_spmv import dist, utils


@pytest.fixture(scope="module")
def mesh():
    return dist.make_mesh(8)


CASES = {
    "laplacian": lambda: utils.laplacian_2d(16, 14),
    "random": lambda: utils.random_sparse(300, 300, 0.03, seed=61),
    "power_law": lambda: utils.power_law(257, 257, 7, seed=62),
    "rect": lambda: utils.random_sparse(190, 310, 0.04, seed=63),
    "tiny": lambda: utils.random_sparse(10, 10, 0.3, seed=64),
}


@pytest.fixture(params=sorted(CASES), ids=sorted(CASES))
def mat(request):
    return CASES[request.param]()


def test_plan_rows_nnz_balance():
    A = utils.power_law(1000, 1000, 10, seed=65)
    plan = dist.plan_rows(A.indptr, 8, balance="nnz")
    s = np.asarray(plan.starts)
    assert s[0] == 0 and s[-1] == 1000
    nnz_per = A.indptr[s[1:]] - A.indptr[s[:-1]]
    # nnz-balanced: no shard more than 2x the mean (even split can be ~10x off)
    assert nnz_per.max() <= 2.0 * A.nnz / 8

    even = dist.plan_rows(A.indptr, 8, balance="rows")
    assert np.all(np.diff(even.starts) >= 1000 // 8)


def test_plan_even_remainder():
    plan = dist.plan_even(10, 4)
    assert list(plan.counts) == [3, 3, 2, 2]
    assert plan.owner_of(np.array([0, 2, 3, 9])).tolist() == [0, 0, 1, 3]


def test_sharded_vector_roundtrip():
    plan = dist.plan_even(103, 8)
    x = np.random.default_rng(0).standard_normal(103)
    sv = dist.ShardedVector.from_global(x, plan)
    assert sv.chunks.shape == (8, 13)
    np.testing.assert_array_equal(sv.to_global(), x)


@pytest.mark.parametrize("balance", ["nnz", "rows"])
def test_spmv_allgather(mesh, mat, balance, rng):
    csr = ts.convert(ts.COO.from_scipy(mat), "csr")
    A = dist.ShardedCSR.build(csr, 8, balance=balance)
    x = rng.standard_normal(mat.shape[1])
    xs = dist.ShardedVector.from_global(x, A.col_plan)
    A, xs = dist.place(A, mesh), dist.place(xs, mesh)
    ys = dist.spmv_allgather(mesh, A, xs)
    np.testing.assert_allclose(ys.to_global(), mat @ x, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("balance", ["nnz", "rows"])
def test_spmv_halo(mesh, mat, balance, rng):
    csr = ts.convert(ts.COO.from_scipy(mat), "csr")
    A = dist.HaloCSR.build(csr, 8, balance=balance)
    x = rng.standard_normal(mat.shape[1])
    xs = dist.ShardedVector.from_global(x, A.col_plan)
    A, xs = dist.place(A, mesh), dist.place(xs, mesh)
    ys = dist.spmv_halo(mesh, A, xs)
    np.testing.assert_allclose(ys.to_global(), mat @ x, rtol=1e-12, atol=1e-12)


def test_halo_equals_allgather(mesh, rng):
    """Both strategies compute the same product."""
    mat = utils.random_sparse(400, 400, 0.02, seed=66)
    csr = ts.convert(ts.COO.from_scipy(mat), "csr")
    x = rng.standard_normal(400)
    Ag = dist.ShardedCSR.build(csr, 8)
    Ah = dist.HaloCSR.build(csr, 8)
    xg = dist.ShardedVector.from_global(x, Ag.col_plan)
    y1 = dist.spmv_allgather(mesh, Ag, xg).to_global()
    y2 = dist.spmv_halo(mesh, Ah, xg).to_global()
    np.testing.assert_allclose(y1, y2, rtol=1e-13)


def test_spmv_jit_with_sharding(mesh, rng):
    """The full jitted SPMD path: placed inputs, jitted shard_map, output
    sharding preserved."""
    mat = utils.laplacian_2d(20, 20)
    csr = ts.convert(ts.COO.from_scipy(mat), "csr")
    A = dist.place(dist.ShardedCSR.build(csr, 8), mesh)
    x = rng.standard_normal(400)
    xs = dist.place(dist.ShardedVector.from_global(x, A.col_plan), mesh)

    fn = jax.jit(lambda a, v: dist.spmv_allgather(mesh, a, v))
    ys = fn(A, xs)
    np.testing.assert_allclose(ys.to_global(), mat @ x, rtol=1e-12)
    # result is actually sharded over the mesh
    assert len(ys.chunks.sharding.device_set) == 8


def test_sharded_blas(mesh, rng):
    plan = dist.plan_even(500, 8)
    x = rng.standard_normal(500)
    y = rng.standard_normal(500)
    xs = dist.place(dist.ShardedVector.from_global(x, plan), mesh)
    ys = dist.place(dist.ShardedVector.from_global(y, plan), mesh)
    np.testing.assert_allclose(float(dist.blas.dot(xs, ys)), x @ y, rtol=1e-12)
    np.testing.assert_allclose(
        dist.blas.axpby(2.0, xs, -0.5, ys).to_global(), 2 * x - 0.5 * y
    )
    np.testing.assert_allclose(float(dist.blas.norm2(xs)),
                               np.linalg.norm(x), rtol=1e-12)
    with pytest.raises(ValueError, match="mismatched partitions"):
        dist.blas.dot(xs, dist.ShardedVector.from_global(
            np.zeros(499), dist.plan_even(499, 8)))


def test_ndev_larger_than_rows(mesh):
    """More devices than rows: degenerate shards must still work."""
    mat = utils.random_sparse(5, 5, 0.5, seed=67)
    csr = ts.convert(ts.COO.from_scipy(mat), "csr")
    A = dist.ShardedCSR.build(csr, 8)
    x = np.ones(5)
    xs = dist.ShardedVector.from_global(x, A.col_plan)
    ys = dist.spmv_allgather(mesh, dist.place(A, mesh), dist.place(xs, mesh))
    np.testing.assert_allclose(ys.to_global(), mat @ x, rtol=1e-12)


def test_weak_scaling_sanity(mesh, rng):
    """1 vs 8 shards give identical results (scaling changes nothing
    numerically)."""
    mat = utils.laplacian_2d(18, 18)
    csr = ts.convert(ts.COO.from_scipy(mat), "csr")
    x = rng.standard_normal(mat.shape[1])
    mesh1 = dist.make_mesh(1)
    A1 = dist.ShardedCSR.build(csr, 1)
    x1 = dist.ShardedVector.from_global(x, A1.col_plan)
    y1 = dist.spmv_allgather(mesh1, A1, x1).to_global()
    A8 = dist.HaloCSR.build(csr, 8)
    x8 = dist.ShardedVector.from_global(x, A8.col_plan)
    y8 = dist.spmv_halo(mesh, dist.place(A8, mesh),
                        dist.place(x8, mesh)).to_global()
    np.testing.assert_allclose(y1, y8, rtol=1e-12)


@pytest.mark.parametrize("kind", ["allgather", "halo"])
def test_spmm_sharded(mesh, rng, kind):
    """Row-sharded multi-RHS SpMM (BASELINE config 3, distributed)."""
    mat = utils.random_sparse(220, 180, 0.05, seed=68)
    csr = ts.convert(ts.COO.from_scipy(mat), "csr")
    X = rng.standard_normal((180, 7))
    if kind == "halo":
        A = dist.HaloCSR.build(csr, 8)
        Xs = dist.ShardedVector.from_global(X, A.col_plan)
        Ys = dist.spmm_halo(mesh, dist.place(A, mesh), dist.place(Xs, mesh))
    else:
        A = dist.ShardedCSR.build(csr, 8)
        Xs = dist.ShardedVector.from_global(X, A.col_plan)
        Ys = dist.spmm_allgather(mesh, dist.place(A, mesh),
                                 dist.place(Xs, mesh))
    np.testing.assert_allclose(Ys.to_global(), mat @ X, rtol=1e-12,
                               atol=1e-12)


def test_init_multihost_forwards_and_survives(monkeypatch):
    # VERDICT r1: init_multihost had no test at all.  Mock the JAX
    # runtime call: arguments must forward verbatim, and an
    # already-initialized runtime (RuntimeError) must not propagate.
    calls = []

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        calls.append((coordinator_address, num_processes, process_id))

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    dist.init_multihost("10.0.0.1:8476", 4, 2)
    assert calls == [("10.0.0.1:8476", 4, 2)]

    def raising_init(**kw):
        raise RuntimeError("distributed runtime already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", raising_init)
    dist.init_multihost()  # must not raise


# ---------------------------------------------------------------------------
# neighbor-halo strategy + distributed cost model (VERDICT r4 item 3)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("balance", ["nnz", "rows"])
def test_spmv_neighbor(mesh, mat, balance, rng):
    csr = ts.convert(ts.COO.from_scipy(mat), "csr")
    A = dist.NeighborCSR.build(csr, 8, balance=balance)
    x = rng.standard_normal(mat.shape[1])
    xs = dist.ShardedVector.from_global(x, A.col_plan)
    A, xs = dist.place(A, mesh), dist.place(xs, mesh)
    ys = dist.spmv_neighbor(mesh, A, xs)
    np.testing.assert_allclose(ys.to_global(), mat @ x, rtol=1e-12,
                               atol=1e-12)


def test_neighbor_banded_ships_two_chunks(mesh):
    """A banded operator's halo set is exactly the +-1 ring neighbors —
    the whole point of the strategy (the ring HaloCSR rotates all 8)."""
    mat = utils.laplacian_2d(32, 32)
    csr = ts.convert(ts.COO.from_scipy(mat.tocoo()), "csr")
    A = dist.NeighborCSR.build(csr, 8, balance="rows", square=True)
    assert set(A.offsets) == {1, 7}          # +1 and -1 (mod 8)


def test_spmm_neighbor(mesh, rng):
    mat = utils.random_sparse(300, 300, 0.03, seed=67)
    csr = ts.convert(ts.COO.from_scipy(mat), "csr")
    A = dist.NeighborCSR.build(csr, 8)
    X = rng.standard_normal((300, 4))
    Xs = dist.ShardedVector.from_global(X, A.col_plan)
    A, Xs = dist.place(A, mesh), dist.place(Xs, mesh)
    Ys = dist.spmm_neighbor(mesh, A, Xs)
    s = A.row_starts
    Yg = np.concatenate([np.asarray(Ys.chunks)[i, : s[i + 1] - s[i]]
                         for i in range(8)])
    np.testing.assert_allclose(Yg, mat @ X, rtol=1e-12, atol=1e-12)


def test_neighbor_equals_allgather(mesh, rng):
    mat = utils.random_sparse(400, 400, 0.02, seed=68)
    csr = ts.convert(ts.COO.from_scipy(mat), "csr")
    x = rng.standard_normal(400)
    Ag = dist.ShardedCSR.build(csr, 8)
    An = dist.NeighborCSR.build(csr, 8)
    xg = dist.ShardedVector.from_global(x, Ag.col_plan)
    y1 = dist.spmv_allgather(mesh, Ag, xg).to_global()
    y2 = dist.spmv_neighbor(mesh, An, xg).to_global()
    np.testing.assert_allclose(y1, y2, rtol=1e-13)


def test_predict_dist_costs_ring_inflation():
    """The cost model captures the measured pathology: on a banded
    operator the ring strategy's padded-bucket work is ~ndev x the
    single-pass strategies' (DIST_r04 measured 6.6x at ndev=8)."""
    lap = utils.laplacian_2d(64, 64).tocsr().astype(np.float32)
    c = dist.predict_dist_costs(lap, 8, square=True)
    assert c["csr_halo"]["work_vals"] >= 4 * c["csr_allgather"]["work_vals"]
    assert c["pick"] in ("csr_neighbor", "csr_allgather")
    assert c["csr_neighbor"]["halo_offsets"] == 2


def test_predict_dist_costs_link_bandwidth_crossover():
    """Parameterized link bandwidth moves the crossover: at DCN-like
    bandwidth the neighbor strategy's k-chunk traffic beats the
    all-gather's (P-1)-chunk traffic on a banded operator."""
    lap = utils.laplacian_2d(256, 256).tocsr().astype(np.float32)
    slow = dist.predict_dist_costs(lap, 8, square=True, link_gbps=0.05)
    assert slow["pick"] == "csr_neighbor"
    assert (slow["csr_neighbor"]["comm_bytes"]
            < slow["csr_allgather"]["comm_bytes"])


def test_plan_dist_csr_strategies(mesh, rng):
    """Forced csr_neighbor / csr_allgather plans execute and verify;
    the None-strategy CSR fallback picks via the cost model."""
    import dataclasses as dc

    mat = utils.random_sparse(500, 500, 0.05, seed=69)  # too dense for gpr?
    x = rng.standard_normal(500).astype(np.float32)
    ref = mat.astype(np.float64) @ x.astype(np.float64)
    for strat in ("csr_neighbor", "csr_allgather", "csr_halo"):
        plan = dist.plan_dist_spmv(mat, 8, dtype=np.float32,
                                   strategy=strat)
        assert plan.strategy == strat
        xs = dist.place(plan.shard_x(x, dtype=np.float32), mesh)
        M = dist.place(plan.matrix, mesh)
        y = dc.replace(plan, matrix=M).spmv(mesh, xs)
        yg = plan.y_to_global(y)
        rel = np.max(np.abs(yg - ref)) / np.max(np.abs(ref))
        assert rel < 2e-5, (strat, rel)


def test_dist_cg_neighbor(rng):
    """dist_cg over the neighbor-halo matvec."""
    from tpu_spmv.solvers import dist_cg

    spd = utils.laplacian_2d(12, 12)
    mesh = dist.make_mesh(8)
    csr = ts.convert(ts.COO.from_scipy(spd.tocoo()), "csr")
    A = dist.NeighborCSR.build(csr, 8, square=True)
    b = rng.standard_normal(144)
    bs = dist.ShardedVector.from_global(b, A.row_plan)
    A, bs = dist.place(A, mesh), dist.place(bs, mesh)
    res = dist_cg(mesh, A, bs, tol=1e-10, maxiter=2000)
    assert bool(res.converged)
    np.testing.assert_allclose(spd @ res.x.to_global(), b, rtol=1e-6,
                               atol=1e-7)
