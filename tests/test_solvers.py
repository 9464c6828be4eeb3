"""Solver tests: CG (plain, preconditioned, matvec-closure, distributed),
power iteration — all against scipy/numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_spmv as ts
from tpu_spmv import dist, utils
from tpu_spmv.solvers import cg, dist_cg, jacobi_preconditioner, power_iteration


@pytest.fixture(scope="module")
def spd():
    # SPD: 2-D Laplacian
    return utils.laplacian_2d(12, 12)


def test_cg_solves_laplacian(spd, rng):
    b = rng.standard_normal(spd.shape[0])
    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    res = cg(A, jnp.asarray(b), tol=1e-10, maxiter=2000)
    assert bool(res.converged)
    x_ref = np.linalg.solve(spd.toarray(), b)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-6, atol=1e-8)


def test_cg_jacobi_preconditioner(spd, rng):
    b = rng.standard_normal(spd.shape[0])
    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    plain = cg(A, jnp.asarray(b), tol=1e-10, maxiter=2000)
    pre = cg(A, jnp.asarray(b), tol=1e-10, maxiter=2000,
             precond=jacobi_preconditioner(A))
    assert bool(pre.converged)
    assert int(pre.iterations) <= int(plain.iterations) + 5
    np.testing.assert_allclose(np.asarray(pre.x), np.asarray(plain.x),
                               rtol=1e-5, atol=1e-7)


def test_cg_with_matvec_closure(spd, rng):
    A = ts.convert(ts.COO.from_scipy(spd), "dia")
    b = rng.standard_normal(spd.shape[0])
    res = cg(lambda v: ts.spmv(A, v), jnp.asarray(b), tol=1e-10, maxiter=2000)
    assert bool(res.converged)
    np.testing.assert_allclose(
        spd @ np.asarray(res.x), b, rtol=1e-6, atol=1e-7
    )


def test_cg_maxiter_cap(spd, rng):
    b = rng.standard_normal(spd.shape[0])
    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    res = cg(A, jnp.asarray(b), tol=1e-14, maxiter=3)
    assert int(res.iterations) == 3
    assert not bool(res.converged)


def test_cg_runner_fixed_k_matches_cg(spd, rng):
    from tpu_spmv.solvers import cg_runner

    b = rng.standard_normal(spd.shape[0])
    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    ref = cg(A, jnp.asarray(b), tol=0.0, maxiter=40)
    run = cg_runner(A, iters=40)
    res = run(jnp.asarray(b))
    assert int(res.iterations) == 40
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-5, atol=1e-7)


def test_cg_runner_reuses_trace(spd, rng):
    from tpu_spmv.solvers import cg_runner

    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    traces = []

    def matvec(v):
        traces.append(1)          # appended once per TRACE, not per call
        return ts.spmv(A, v)

    run = cg_runner(matvec, iters=300)
    b1 = rng.standard_normal(spd.shape[0])
    b2 = rng.standard_normal(spd.shape[0])
    run(jnp.asarray(b1))
    n_after_first = len(traces)
    r2 = run(jnp.asarray(b2))
    assert len(traces) == n_after_first          # second solve: no retrace
    x_ref = np.linalg.solve(spd.toarray(), b2)
    np.testing.assert_allclose(np.asarray(r2.x), x_ref, rtol=1e-4, atol=1e-5)


def test_cg_runner_tol_mode(spd, rng):
    from tpu_spmv.solvers import cg_runner

    b = rng.standard_normal(spd.shape[0])
    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    run = cg_runner(A, iters=2000, tol=1e-10)
    res = run(jnp.asarray(b))
    assert bool(res.converged)
    assert int(res.iterations) < 2000
    x_ref = np.linalg.solve(spd.toarray(), b)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-6,
                               atol=1e-8)


def test_cg_runner_validates_iters(spd):
    from tpu_spmv.solvers import cg_runner

    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    with pytest.raises(ValueError, match="iters"):
        cg_runner(A, iters=0)


def test_cg_multi_matches_columnwise_cg(spd, rng):
    from tpu_spmv.solvers import cg_multi

    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    B = rng.standard_normal((spd.shape[0], 4))
    res = cg_multi(A, jnp.asarray(B), tol=1e-10, maxiter=2000)
    assert bool(res.converged.all())
    X_ref = np.linalg.solve(spd.toarray(), B)
    np.testing.assert_allclose(np.asarray(res.x), X_ref, rtol=1e-5,
                               atol=1e-7)


def test_cg_multi_freezes_converged_columns(spd, rng):
    # column 0: b = A @ e (converges almost immediately); column 1: random
    # (needs many iterations).  The frozen column must hold its answer.
    from tpu_spmv.solvers import cg_multi

    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    n = spd.shape[0]
    e = np.zeros(n)
    e[3] = 1.0
    B = np.stack([spd @ e, rng.standard_normal(n)], axis=1)
    res = cg_multi(A, jnp.asarray(B), tol=1e-9, maxiter=2000)
    assert bool(res.converged.all())
    X_ref = np.linalg.solve(spd.toarray(), B)
    np.testing.assert_allclose(np.asarray(res.x), X_ref, rtol=1e-4,
                               atol=1e-6)


def test_cg_multi_runner_fixed_k_and_precond(spd, rng):
    from tpu_spmv.solvers import cg_multi_runner

    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    run = cg_multi_runner(A, iters=300,
                          precond=jacobi_preconditioner(A))
    B = rng.standard_normal((spd.shape[0], 3))
    res = run(jnp.asarray(B))
    assert int(res.iterations) == 300
    X_ref = np.linalg.solve(spd.toarray(), B)
    np.testing.assert_allclose(np.asarray(res.x), X_ref, rtol=1e-4,
                               atol=1e-5)


def test_cg_multi_through_plan(spd, rng):
    # the plan path: strategy SpMM kernels drive the batched solve
    from tpu_spmv.ops.auto import plan_spmv
    from tpu_spmv.solvers import cg_multi

    plan = plan_spmv(spd)
    B = rng.standard_normal((spd.shape[0], 3))
    res = cg_multi(plan, jnp.asarray(B), tol=1e-8, maxiter=2000)
    assert bool(res.converged.all())
    X_ref = np.linalg.solve(spd.toarray(), B)
    np.testing.assert_allclose(np.asarray(res.x), X_ref, rtol=1e-4,
                               atol=1e-5)


def test_cg_multi_rejects_vector_b(spd):
    from tpu_spmv.solvers import cg_multi

    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    with pytest.raises(ValueError, match="n, k"):
        cg_multi(A, jnp.ones(spd.shape[0]))


def test_power_iteration(spd):
    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    lam, v = power_iteration(A, iters=300)
    from scipy.sparse.linalg import eigsh

    lam_ref = eigsh(spd, k=1, which="LM", return_eigenvectors=False)[0]
    np.testing.assert_allclose(float(lam), lam_ref, rtol=1e-4)


def test_chebyshev_solves_laplacian(spd, rng):
    from scipy.sparse.linalg import eigsh
    from tpu_spmv.solvers import chebyshev

    b = rng.standard_normal(spd.shape[0])
    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    lmax = float(eigsh(spd, k=1, which="LM",
                       return_eigenvectors=False)[0]) * 1.01
    lmin = float(eigsh(spd, k=1, which="SM",
                       return_eigenvectors=False)[0]) * 0.99
    res = chebyshev(A, jnp.asarray(b), lmin=lmin, lmax=lmax,
                    tol=1e-10, maxiter=5000)
    assert bool(res.converged)
    x_ref = np.linalg.solve(spd.toarray(), b)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-6,
                               atol=1e-8)


def test_chebyshev_bad_interval(spd):
    from tpu_spmv.solvers import chebyshev

    with pytest.raises(ValueError, match="lmin"):
        chebyshev(ts.convert(ts.COO.from_scipy(spd), "csr"),
                  jnp.ones(spd.shape[0]), lmin=-1.0, lmax=2.0)


def test_chebyshev_preconditioner_cuts_cg_iterations(spd, rng):
    from tpu_spmv.solvers import chebyshev_preconditioner

    b = rng.standard_normal(spd.shape[0])
    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    plain = cg(A, jnp.asarray(b), tol=1e-10, maxiter=2000)
    pre = cg(A, jnp.asarray(b), tol=1e-10, maxiter=2000,
             precond=chebyshev_preconditioner(A, degree=4))
    assert bool(pre.converged)
    # degree-4 polynomial must cut CG's (reduction-bearing) iterations
    # by well over the 4x SpMV cost it adds — the reduction trade
    assert int(pre.iterations) * 2 < int(plain.iterations)
    np.testing.assert_allclose(np.asarray(pre.x), np.asarray(plain.x),
                               rtol=1e-5, atol=1e-7)


def test_chebyshev_matvec_closure(spd, rng):
    from scipy.sparse.linalg import eigsh
    from tpu_spmv.solvers import chebyshev

    A = ts.convert(ts.COO.from_scipy(spd), "dia")
    b = rng.standard_normal(spd.shape[0])
    lmax = float(eigsh(spd, k=1, which="LM",
                       return_eigenvectors=False)[0]) * 1.01
    res = chebyshev(lambda v: ts.spmv(A, v), jnp.asarray(b),
                    lmin=lmax / 200.0, lmax=lmax, tol=1e-8, maxiter=8000)
    assert bool(res.converged)
    np.testing.assert_allclose(spd @ np.asarray(res.x), b, rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("kind", ["allgather", "halo"])
def test_dist_cg(spd, rng, kind):
    mesh = dist.make_mesh(8)
    csr = ts.convert(ts.COO.from_scipy(spd), "csr")
    if kind == "halo":
        A = dist.HaloCSR.build(csr, 8, square=True)
    else:
        A = dist.ShardedCSR.build(csr, 8, square=True)
    b = rng.standard_normal(spd.shape[0])
    bs = dist.ShardedVector.from_global(b, A.row_plan)
    A, bs = dist.place(A, mesh), dist.place(bs, mesh)
    res = dist_cg(mesh, A, bs, tol=1e-10, maxiter=2000)
    assert bool(res.converged)
    x = res.x.to_global()
    np.testing.assert_allclose(spd @ x, b, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("kind", ["allgather", "halo"])
def test_dist_bicgstab_nonsym(rng, kind):
    import scipy.sparse as sp
    from tpu_spmv.solvers import dist_bicgstab

    lap = utils.laplacian_2d(12, 12)
    pert = sp.random(144, 144, density=0.02, random_state=42, format="csr")
    m = (lap + 0.5 * (pert - pert.T) + 2.0 * sp.eye(144, format="csr")
         ).tocsr()
    mesh = dist.make_mesh(8)
    csr = ts.convert(ts.COO.from_scipy(m.tocoo()), "csr")
    if kind == "halo":
        A = dist.HaloCSR.build(csr, 8, square=True)
    else:
        A = dist.ShardedCSR.build(csr, 8, square=True)
    b = rng.standard_normal(144)
    bs = dist.ShardedVector.from_global(b, A.row_plan)
    A, bs = dist.place(A, mesh), dist.place(bs, mesh)
    res = dist_bicgstab(mesh, A, bs, tol=1e-10, maxiter=2000)
    assert bool(res.converged)
    x = res.x.to_global()
    np.testing.assert_allclose(m @ x, b, rtol=1e-6, atol=1e-7)


def test_dist_cg_partition_mismatch(spd, rng):
    mesh = dist.make_mesh(8)
    csr = ts.convert(ts.COO.from_scipy(spd), "csr")
    A = dist.ShardedCSR.build(csr, 8)        # square=False: col plan differs
    b = dist.ShardedVector.from_global(
        rng.standard_normal(spd.shape[0]), A.row_plan)
    with pytest.raises(ValueError, match="row partition == column"):
        dist_cg(mesh, dist.place(A, mesh), dist.place(b, mesh))


def test_checkpoint_roundtrip(tmp_path, rng):
    from tpu_spmv.io import checkpoint

    mat = utils.laplacian_2d(7, 9)
    for fmt in ["csr", "dia", "bsr", "bdia", "ell", "coo", "csc"]:
        M = ts.convert(ts.COO.from_scipy(mat), fmt)
        p = tmp_path / f"m_{fmt}.npz"
        checkpoint.save_matrix(p, M)
        M2 = checkpoint.load_matrix(p)
        assert type(M2) is type(M)
        np.testing.assert_allclose(
            np.asarray(M2.todense()), mat.toarray(), err_msg=fmt
        )
    v = jnp.asarray(rng.standard_normal(32))
    checkpoint.save_vector(tmp_path / "v.npz", v)
    np.testing.assert_array_equal(
        np.asarray(checkpoint.load_vector(tmp_path / "v.npz")), np.asarray(v)
    )


def test_lanczos_extremal_eigs(spd):
    from scipy.sparse.linalg import eigsh
    from tpu_spmv.solvers import eigsh_lanczos

    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    lmin, lmax = eigsh_lanczos(A, k=60, full_reorth=True)
    lmax_ref = float(eigsh(spd, k=1, which="LM",
                           return_eigenvectors=False)[0])
    lmin_ref = float(eigsh(spd, k=1, which="SM",
                           return_eigenvectors=False)[0])
    np.testing.assert_allclose(lmax, lmax_ref, rtol=1e-6)
    np.testing.assert_allclose(lmin, lmin_ref, rtol=1e-3)
    assert eigsh_lanczos(A, k=60, which="LM") == pytest.approx(
        lmax_ref, rel=1e-6)


def test_lanczos_no_reorth_lmax(spd):
    # without re-orthogonalization the TOP of the spectrum still
    # converges fast (ghost eigenvalues repeat, they don't move the max)
    from scipy.sparse.linalg import eigsh
    from tpu_spmv.solvers import eigsh_lanczos

    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    lmax = eigsh_lanczos(A, k=60, which="LM", full_reorth=False)
    lmax_ref = float(eigsh(spd, k=1, which="LM",
                           return_eigenvectors=False)[0])
    np.testing.assert_allclose(lmax, lmax_ref, rtol=1e-5)


def test_lanczos_matvec_closure(spd):
    from tpu_spmv.solvers import eigsh_lanczos, lanczos

    A = ts.convert(ts.COO.from_scipy(spd), "dia")
    n = spd.shape[0]
    lmax = eigsh_lanczos(lambda v: ts.spmv(A, v), k=40, which="LM", n=n)
    assert lmax > 0
    with pytest.raises(ValueError, match="n="):
        lanczos(lambda v: v, k=5)


def test_lanczos_feeds_chebyshev(spd, rng):
    # the intended pipeline: lanczos window -> chebyshev solve
    from tpu_spmv.solvers import chebyshev, eigsh_lanczos

    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    lmin, lmax = eigsh_lanczos(A, k=80, full_reorth=True)
    b = rng.standard_normal(spd.shape[0])
    res = chebyshev(A, jnp.asarray(b), lmin=lmin * 0.99, lmax=lmax * 1.01,
                    tol=1e-9, maxiter=5000)
    assert bool(res.converged)
    x_ref = np.linalg.solve(spd.toarray(), b)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-5,
                               atol=1e-7)


def test_multicolor_valid_and_redblack(spd):
    from tpu_spmv.solvers import multicolor

    color = multicolor(spd)
    S = (spd + spd.T).tocsr()
    # validity: no edge inside a color
    coo = S.tocoo()
    off = coo.row != coo.col
    assert np.all(color[coo.row[off]] != color[coo.col[off]])
    # a 5-point grid stencil is red-black
    assert color.max() == 1


def test_sor_gauss_seidel_solves(spd, rng):
    from tpu_spmv.solvers import sor

    b = rng.standard_normal(spd.shape[0])
    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    res = sor(A, jnp.asarray(b), host_mat=spd, tol=1e-10, maxiter=3000)
    assert bool(res.converged)
    x_ref = np.linalg.solve(spd.toarray(), b)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-6,
                               atol=1e-8)
    # over-relaxation accelerates on this SPD model problem
    res_sor = sor(A, jnp.asarray(b), host_mat=spd, omega=1.5,
                  tol=1e-10, maxiter=3000)
    assert bool(res_sor.converged)
    assert int(res_sor.iterations) < int(res.iterations)


def test_sor_matches_color_ordered_gs(spd, rng):
    # one multicolor sweep == classical GS in color-sorted row order
    # (simultaneous same-color updates are independent by construction)
    from tpu_spmv.solvers import multicolor
    from tpu_spmv.solvers.relaxation import gauss_seidel_sweep

    n = spd.shape[0]
    b = rng.standard_normal(n)
    x0 = rng.standard_normal(n)
    color = multicolor(spd)
    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    d = spd.diagonal()
    x1 = gauss_seidel_sweep(A, jnp.asarray(b), jnp.asarray(x0),
                            color=jnp.asarray(color, jnp.int32),
                            ncolors=int(color.max()) + 1,
                            dinv=jnp.asarray(1.0 / d))
    # numpy reference: sweep colors in order, simultaneous within color
    Ad = spd.toarray()
    x_ref = x0.copy()
    for c in range(int(color.max()) + 1):
        rows = np.flatnonzero(color == c)
        upd = (b[rows] - Ad[rows] @ x_ref + d[rows] * x_ref[rows]) / d[rows]
        x_ref[rows] = upd
    np.testing.assert_allclose(np.asarray(x1), x_ref, rtol=1e-12,
                               atol=1e-12)


def test_symgs_preconditioner_cuts_cg_iterations(spd, rng):
    from tpu_spmv.solvers import symgs_preconditioner

    b = rng.standard_normal(spd.shape[0])
    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    plain = cg(A, jnp.asarray(b), tol=1e-10, maxiter=2000)
    pre = cg(A, jnp.asarray(b), tol=1e-10, maxiter=2000,
             precond=symgs_preconditioner(A, spd))
    assert bool(pre.converged)
    # one symmetric sweep cuts iterations ~2x (measured 43 -> 22)
    assert int(pre.iterations) < 0.6 * int(plain.iterations)
    np.testing.assert_allclose(np.asarray(pre.x), np.asarray(plain.x),
                               rtol=1e-5, atol=1e-7)


def test_sor_needs_coloring_source(spd):
    from tpu_spmv.solvers import multicolor, sor

    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    with pytest.raises(ValueError, match="host_mat"):
        sor(A, jnp.ones(spd.shape[0]))
    # color= without dinv= must ALSO raise cleanly (not AttributeError)
    with pytest.raises(ValueError, match="BOTH"):
        sor(A, jnp.ones(spd.shape[0]), color=multicolor(spd))
    # ... and the precomputed color+dinv path works
    res = sor(A, jnp.ones(spd.shape[0]), color=multicolor(spd),
              dinv=1.0 / spd.diagonal(), tol=1e-8, maxiter=3000)
    assert bool(res.converged)


def test_multicolor_native_matches_python(spd):
    from tpu_spmv.solvers import multicolor
    from tpu_spmv.solvers.relaxation import _greedy_color_py
    import scipy.sparse as sp

    S = (sp.csr_matrix(spd) + sp.csr_matrix(spd).T).tocsr()
    S.sort_indices()
    ref = _greedy_color_py(S.indptr, S.indices, S.shape[0])
    np.testing.assert_array_equal(multicolor(spd), ref)


def test_lanczos_exact_breakdown_truncates():
    # v0 = e1 on a diagonal matrix breaks down at step 1 (invariant
    # subspace); the padded zero steps must NOT inject a spurious
    # eigenvalue 0 (code-review r3 finding)
    import scipy.sparse as sp
    from tpu_spmv.solvers import eigsh_lanczos

    D = sp.diags([np.array([2.0, 3.0, 4.0, 5.0])], [0]).tocsr()
    A = ts.convert(ts.COO.from_scipy(D.tocoo()), "csr")
    e1 = np.zeros(4)
    e1[0] = 1.0
    lmin, lmax = eigsh_lanczos(A, k=8, v0=jnp.asarray(e1))
    assert lmin == pytest.approx(2.0, rel=1e-10)
    assert lmax == pytest.approx(2.0, rel=1e-10)


def test_solvers_padded_space_fast_path(rng):
    # streaming-strategy plans iterate WHOLE solver loops in padded row
    # space (SpmvPlan.solver_space): results must match the unpadded
    # path and come back at the logical length
    import scipy.sparse as sp

    from tpu_spmv.kernels import dia_stream
    from tpu_spmv.ops.auto import plan_from_matrix
    from tpu_spmv.solvers import chebyshev

    m = (utils.laplacian_2d(32)
         + 0.5 * sp.identity(1024)).tocsr().astype(np.float32)
    dia = ts.convert(ts.COO.from_scipy(m.tocoo(), dtype=jnp.float32),
                     "dia")
    for strat, pack in (("dia_stream", dia_stream.pack_sdia(dia)),
                        ("pdia_stream",
                         dia_stream.pack_psdia(dia, period=32))):
        plan = plan_from_matrix(pack, strat)
        enc, mv, dec = plan.solver_space()
        assert enc(jnp.zeros(1024)).shape[0] == pack.npad
        b = rng.standard_normal(1024).astype(np.float32)
        res = cg(plan, jnp.asarray(b), tol=1e-6, maxiter=3000)
        assert res.x.shape == (1024,) and bool(res.converged)
        x_ref = np.asarray(sp.linalg.spsolve(
            m.astype(np.float64).tocsc(), b.astype(np.float64)))
        np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-3,
                                   atol=1e-4)
        res2 = chebyshev(plan, jnp.asarray(b), lmin=0.4, lmax=8.6,
                         tol=1e-6, maxiter=6000)
        assert res2.x.shape == (1024,)
        np.testing.assert_allclose(np.asarray(res2.x), x_ref, rtol=1e-3,
                                   atol=1e-4)


def test_ir_bf16_inner_recovers_f32_accuracy(rng):
    # mixed-precision iterative refinement: all inner-CG matrix traffic
    # is bf16 data, yet the TRUE residual (hi-precision recompute each
    # cycle) reaches f32-level accuracy a straight bf16-plan CG cannot
    from tpu_spmv.ops.auto import plan_spmv
    from tpu_spmv.solvers import ir_solve

    # scale by an irrational so the coefficients are NOT bf16-exact
    m = (utils.laplacian_2d(16, 16) * 1.0471975).tocsr().astype(np.float32)
    hi = plan_spmv(m)
    lo = plan_spmv(m, dtype=jnp.bfloat16)
    assert lo.matrix.data.dtype == jnp.bfloat16
    b = rng.standard_normal(m.shape[0]).astype(np.float32)
    res = ir_solve(hi, jnp.asarray(b), low=lo, inner_iters=24,
                   maxiter=40, tol=1e-6)
    assert bool(res.converged)
    assert int(res.outer_iterations) <= 10
    x_ref = np.linalg.solve(m.toarray().astype(np.float64),
                            b.astype(np.float64))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-4,
                               atol=1e-6)
    # the bf16-data perturbation floor: a plain CG ON the bf16 plan
    # cannot reach this true residual (its own recurrence lies)
    res_bf = cg(lo, jnp.asarray(b), tol=1e-6, maxiter=2000)
    true_bf = np.linalg.norm(m @ np.asarray(res_bf.x) - b)
    assert float(res.residual_norm) < 0.1 * true_bf


def test_ir_stagnation_exit(rng):
    # at a tol below the f32 rounding floor, refinement must stop on
    # stagnation (residual no longer contracting), not burn maxiter
    from tpu_spmv.ops.auto import plan_spmv
    from tpu_spmv.solvers import ir_solve

    m = (utils.laplacian_2d(16, 16) * 1.0471975).tocsr().astype(np.float32)
    hi = plan_spmv(m)
    lo = plan_spmv(m, dtype=jnp.bfloat16)
    b = rng.standard_normal(m.shape[0]).astype(np.float32)
    res = ir_solve(hi, jnp.asarray(b), low=lo, inner_iters=24,
                   maxiter=200, tol=1e-12)
    assert not bool(res.converged)
    assert int(res.outer_iterations) < 20   # stagnated, did not spin


def test_ir_padded_space_streaming_pair(rng):
    # hi(f32) and lo(bf16) streaming packs of the SAME matrix share the
    # padded row space: the whole refinement iterates padded, results
    # decode to logical length and match the dense oracle
    import scipy.sparse as sp

    from tpu_spmv.kernels import dia_stream
    from tpu_spmv.ops.auto import plan_from_matrix
    from tpu_spmv.solvers import ir_runner

    m = ((utils.laplacian_2d(32) + 0.5 * sp.identity(1024))
         * 1.0471975).tocsr().astype(np.float32)
    dia = ts.convert(ts.COO.from_scipy(m.tocoo(), dtype=jnp.float32),
                     "dia")
    hi = plan_from_matrix(dia_stream.pack_sdia(dia), "dia_stream")
    lo = plan_from_matrix(
        dia_stream.pack_sdia(dia, data_dtype=jnp.bfloat16), "dia_stream")
    run = ir_runner(hi, low=lo, inner_iters=32, maxiter=60, tol=1e-6)
    b = rng.standard_normal(1024).astype(np.float32)
    res = run(jnp.asarray(b))
    assert res.x.shape == (1024,)
    assert bool(res.converged)
    x_ref = np.asarray(sp.linalg.spsolve(m.astype(np.float64).tocsc(),
                                         b.astype(np.float64)))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-3,
                               atol=1e-4)
    res2 = run(jnp.asarray(b * 2.0))   # runner reuse, same trace
    np.testing.assert_allclose(np.asarray(res2.x), 2.0 * x_ref,
                               rtol=1e-3, atol=1e-4)


def test_ir_degenerates_to_restarted_cg(spd, rng):
    # low=None -> inner CG on A itself: still converges (restarted CG)
    from tpu_spmv.solvers import ir_solve

    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    b = rng.standard_normal(spd.shape[0])
    res = ir_solve(A, jnp.asarray(b), inner_iters=30, maxiter=50,
                   tol=1e-8)
    assert bool(res.converged)
    np.testing.assert_allclose(spd @ np.asarray(res.x), b, rtol=1e-5,
                               atol=1e-6)


def test_ir_validates_args(spd):
    from tpu_spmv.solvers import ir_runner

    with pytest.raises(ValueError, match="inner_iters"):
        ir_runner(ts.convert(ts.COO.from_scipy(spd), "csr"), inner_iters=0)
    with pytest.raises(ValueError, match="needs n="):
        ir_runner(lambda v: v, inner_iters=4)


# ---------------------------------------------------------------------------
# communication-avoiding distributed CG + distributed preconditioning parity
# (VERDICT r4 items 8 and 9)
# ---------------------------------------------------------------------------

def _shard_spd(spd, kind="allgather", ndev=8):
    csr = ts.convert(ts.COO.from_scipy(spd.tocoo()), "csr")
    if kind == "halo":
        A = dist.HaloCSR.build(csr, ndev, square=True)
    else:
        A = dist.ShardedCSR.build(csr, ndev, square=True)
    return A


def _sharded_jacobi(m, plan, mesh):
    """Sharded Jacobi preconditioner: dinv as a ShardedVector, applied
    elementwise (chunk pads are zero, so pads stay zero)."""
    dinv = 1.0 / m.diagonal()
    ds = dist.place(dist.ShardedVector.from_global(dinv, plan), mesh)

    def M(r):
        return dist.ShardedVector(chunks=r.chunks * ds.chunks,
                                  starts=r.starts, length=r.length)

    return M


@pytest.mark.parametrize("kind", ["allgather", "halo"])
def test_dist_cg_ca_matches_cg(spd, rng, kind):
    from tpu_spmv.solvers import dist_cg_ca

    mesh = dist.make_mesh(8)
    A = _shard_spd(spd, kind)
    b = rng.standard_normal(spd.shape[0])
    bs = dist.ShardedVector.from_global(b, A.row_plan)
    A, bs = dist.place(A, mesh), dist.place(bs, mesh)
    ref = dist_cg(mesh, A, bs, tol=1e-10, maxiter=2000)
    res = dist_cg_ca(mesh, A, bs, tol=1e-10, maxiter=2000)
    assert bool(res.converged)
    # Chronopoulos-Gear is CG in exact arithmetic: iteration parity +-1
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    x = res.x.to_global()
    np.testing.assert_allclose(spd @ x, b, rtol=1e-6, atol=1e-7)


def test_dist_cg_ca_preconditioned(spd, rng):
    from tpu_spmv.solvers import dist_cg_ca

    mesh = dist.make_mesh(8)
    A = _shard_spd(spd)
    b = rng.standard_normal(spd.shape[0])
    bs = dist.ShardedVector.from_global(b, A.row_plan)
    Ap, bs = dist.place(A, mesh), dist.place(bs, mesh)
    M = _sharded_jacobi(spd, A.row_plan, mesh)
    plain = dist_cg_ca(mesh, Ap, bs, tol=1e-10, maxiter=2000)
    pre = dist_cg_ca(mesh, Ap, bs, tol=1e-10, maxiter=2000, precond=M)
    assert bool(pre.converged)
    assert int(pre.iterations) <= int(plain.iterations) + 5
    x = pre.x.to_global()
    np.testing.assert_allclose(spd @ x, b, rtol=1e-6, atol=1e-7)


def test_dist_cg_ca_single_reduction(spd, rng):
    """The point of CA-CG: ONE all-reduce barrier per iteration.  Count
    all-reduce ops in the compiled SPMD module: the classical loop body
    carries two data-dependent reduction groups (pAp, then rz/rr), the
    CA body exactly one fused dot_stack."""
    from tpu_spmv.solvers import dist_cg_ca

    mesh = dist.make_mesh(8)
    A = _shard_spd(spd)
    b = rng.standard_normal(spd.shape[0])
    bs = dist.ShardedVector.from_global(b, A.row_plan)
    A, bs = dist.place(A, mesh), dist.place(bs, mesh)

    def count_allreduce(fn):
        txt = jax.jit(
            lambda v: fn(mesh, A, v, tol=1e-10, maxiter=100).x.chunks
        ).lower(bs).compile().as_text()
        return sum(txt.count(p) for p in ("all-reduce(", "all-reduce-start("))

    n_cg = count_allreduce(dist_cg)
    n_ca = count_allreduce(dist_cg_ca)
    # whole-module counts: body + init.  CA = 1 body + 1 init = 2;
    # classical >= 2 in the body alone.
    assert n_ca < n_cg, (n_ca, n_cg)
    assert n_ca <= 2, n_ca


@pytest.mark.parametrize("kind", ["allgather", "halo"])
def test_dist_bicgstab_preconditioned(rng, kind):
    import scipy.sparse as sp
    from tpu_spmv.solvers import dist_bicgstab

    lap = utils.laplacian_2d(12, 12)
    pert = sp.random(144, 144, density=0.02, random_state=42, format="csr")
    m = (lap + 0.5 * (pert - pert.T) + 2.0 * sp.eye(144, format="csr")
         ).tocsr()
    mesh = dist.make_mesh(8)
    csr = ts.convert(ts.COO.from_scipy(m.tocoo()), "csr")
    if kind == "halo":
        A = dist.HaloCSR.build(csr, 8, square=True)
    else:
        A = dist.ShardedCSR.build(csr, 8, square=True)
    b = rng.standard_normal(144)
    bs = dist.ShardedVector.from_global(b, A.row_plan)
    M = _sharded_jacobi(m, A.row_plan, mesh)
    Ap, bs = dist.place(A, mesh), dist.place(bs, mesh)
    res = dist_bicgstab(mesh, Ap, bs, tol=1e-10, maxiter=2000, precond=M)
    assert bool(res.converged)
    x = res.x.to_global()
    np.testing.assert_allclose(m @ x, b, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("kind", ["allgather", "halo"])
def test_dist_gmres_nonsym(rng, kind):
    import scipy.sparse as sp
    from tpu_spmv.solvers import dist_gmres

    lap = utils.laplacian_2d(12, 12)
    pert = sp.random(144, 144, density=0.02, random_state=7, format="csr")
    m = (lap + 0.5 * (pert - pert.T) + 2.0 * sp.eye(144, format="csr")
         ).tocsr()
    mesh = dist.make_mesh(8)
    csr = ts.convert(ts.COO.from_scipy(m.tocoo()), "csr")
    if kind == "halo":
        A = dist.HaloCSR.build(csr, 8, square=True)
    else:
        A = dist.ShardedCSR.build(csr, 8, square=True)
    b = rng.standard_normal(144)
    bs = dist.ShardedVector.from_global(b, A.row_plan)
    Ap, bs = dist.place(A, mesh), dist.place(bs, mesh)
    res = dist_gmres(mesh, Ap, bs, tol=1e-10, restart=40, maxiter=2000)
    assert bool(res.converged)
    x = res.x.to_global()
    np.testing.assert_allclose(m @ x, b, rtol=1e-6, atol=1e-7)


def test_dist_gmres_preconditioned_matches_serial(rng):
    import scipy.sparse as sp
    from tpu_spmv.solvers import dist_gmres, gmres

    lap = utils.laplacian_2d(12, 12)
    pert = sp.random(144, 144, density=0.02, random_state=11, format="csr")
    m = (lap + 0.5 * (pert - pert.T) + 3.0 * sp.eye(144, format="csr")
         ).tocsr()
    mesh = dist.make_mesh(8)
    csr = ts.convert(ts.COO.from_scipy(m.tocoo()), "csr")
    A = dist.ShardedCSR.build(csr, 8, square=True)
    b = rng.standard_normal(144)
    bs = dist.ShardedVector.from_global(b, A.row_plan)
    M = _sharded_jacobi(m, A.row_plan, mesh)
    Ap, bsp = dist.place(A, mesh), dist.place(bs, mesh)
    res = dist_gmres(mesh, Ap, bsp, tol=1e-10, restart=40, maxiter=2000,
                     precond=M)
    assert bool(res.converged)
    # serial right-preconditioned GMRES with the same Jacobi: same math
    dinv = jnp.asarray(1.0 / m.diagonal())
    sref = gmres(csr, jnp.asarray(b), tol=1e-10, restart=40, maxiter=2000,
                 precond=lambda v: v * dinv)
    assert bool(sref.converged)
    # inner-step counts agree within one restart cycle
    assert abs(int(res.iterations) - int(sref.iterations)) <= 40
    np.testing.assert_allclose(m @ res.x.to_global(), b, rtol=1e-6,
                               atol=1e-7)


def test_cg_runner_k_matches_fixed(spd, rng):
    """The dynamic-k runner (one compile serves all k — the bench's
    k-differencing protocol) matches the static fixed-k runner."""
    from tpu_spmv.solvers import cg_runner, cg_runner_k

    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    b = jnp.asarray(rng.standard_normal(spd.shape[0]))
    runk = cg_runner_k(A)
    for k in (7, 40):
        fixed = cg_runner(A, iters=k, tol=None)(b)
        dyn = runk(b, k)
        np.testing.assert_allclose(np.asarray(dyn.x), np.asarray(fixed.x),
                                   rtol=1e-10, atol=1e-12)
        assert int(dyn.iterations) == k


def test_cg_true_tol_restarts(spd, rng):
    """true_tol gates on the TRUE residual ||b - A@x||/||b|| and
    restarts past an insufficient per-pass maxiter (each restart
    recomputes r = b - A@x exactly, killing recursive-residual drift —
    the on-chip f64 drift case measured recursive 9.9e-12 vs true
    2.9e-10 at iter ~1000)."""
    b = rng.standard_normal(spd.shape[0])
    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    # one 30-iteration pass cannot converge this operator; restarts must
    res = cg(A, jnp.asarray(b), tol=1e-12, maxiter=30,
             true_tol=1e-10, max_restarts=20)
    assert bool(res.converged)
    assert int(res.iterations) > 30          # accumulated across restarts
    r_true = np.linalg.norm(b - spd @ np.asarray(res.x))
    assert r_true <= 1e-10 * np.linalg.norm(b)
    # residual_norm IS the true residual in this mode
    np.testing.assert_allclose(float(res.residual_norm), r_true,
                               rtol=1e-6, atol=1e-14)


def test_cg_true_tol_stall_guard(spd, rng):
    """An inner tol ABOVE true_tol cannot make progress; the restart
    loop must detect the 0-iteration stall and return non-converged
    instead of spinning max_restarts no-ops."""
    b = rng.standard_normal(spd.shape[0])
    A = ts.convert(ts.COO.from_scipy(spd), "csr")
    res = cg(A, jnp.asarray(b), tol=1e-4, maxiter=2000,
             true_tol=1e-14, max_restarts=50)
    assert not bool(res.converged)
