"""Geometric multigrid preconditioner (solvers/multigrid.py).

Validates the three load-bearing claims: the stencil apply IS the
laplacian matrix, the V-cycle is a symmetric linear map (PCG validity),
and MG-PCG collapses the iteration count on grids where plain CG scales
with g (the reference's BASELINE configs 1-2 operators)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_spmv.formats import COO, convert
from tpu_spmv.solvers import cg, mg_preconditioner, poisson_stencil_apply
from tpu_spmv.utils import laplacian_2d, laplacian_3d


def test_stencil_matches_laplacian_2d(rng):
    g = 24
    A = laplacian_2d(g).astype(np.float64)
    u = rng.random(g * g)
    y = np.asarray(
        poisson_stencil_apply(jnp.asarray(u.reshape(g, g)))).ravel()
    np.testing.assert_allclose(y, A @ u, rtol=1e-12)


def test_stencil_matches_laplacian_3d(rng):
    g = 8
    A = laplacian_3d(g).astype(np.float64)
    u = rng.random(g ** 3)
    y = np.asarray(
        poisson_stencil_apply(jnp.asarray(u.reshape(g, g, g)))).ravel()
    np.testing.assert_allclose(y, A @ u, rtol=1e-12)


def test_stencil_shift(rng):
    g = 16
    A = laplacian_2d(g).astype(np.float64)
    u = rng.random(g * g)
    y = np.asarray(
        poisson_stencil_apply(jnp.asarray(u.reshape(g, g)), 2.5)).ravel()
    np.testing.assert_allclose(y, A @ u + 2.5 * u, rtol=1e-12)


def test_vcycle_symmetric(rng):
    # r1' M r2 == r2' M r1 (exact-adjoint transfers + symmetric smoothing
    # + linear Chebyshev coarse solve) — the PCG validity condition
    M = mg_preconditioner((32, 32))
    r1 = jnp.asarray(rng.random(1024))
    r2 = jnp.asarray(rng.random(1024))
    s1 = float(jnp.vdot(r1, M(r2)))
    s2 = float(jnp.vdot(r2, M(r1)))
    assert abs(s1 - s2) <= 1e-10 * abs(s1)


def test_vcycle_positive_definite(rng):
    # r' M r > 0 for a spread of vectors (SPD requirement)
    M = mg_preconditioner((16, 16))
    for seed in range(5):
        r = jnp.asarray(np.random.default_rng(seed).standard_normal(256))
        assert float(jnp.vdot(r, M(r))) > 0.0


@pytest.mark.parametrize("g,max_mg_iters", [(64, 12), (128, 14)])
def test_mgpcg_iteration_collapse(rng, g, max_mg_iters):
    A = convert(COO.from_scipy(laplacian_2d(g).tocoo(),
                               dtype=jnp.float32), "dia")
    b = jnp.asarray(rng.random(g * g), jnp.float32)
    plain = cg(A, b, tol=1e-4, maxiter=3000)
    M = mg_preconditioner((g, g))
    pcg = cg(A, b, tol=1e-4, maxiter=100, precond=M)
    assert bool(pcg.converged)
    assert int(pcg.iterations) <= max_mg_iters
    # the collapse is the point: >= 8x fewer iterations than plain CG
    assert int(plain.iterations) >= 8 * int(pcg.iterations)
    # and the answer is right: true residual against the matrix
    x = np.asarray(pcg.x, np.float64)
    r = np.asarray(b, np.float64) - laplacian_2d(g).astype(np.float64) @ x
    # the recursive-residual gate was 1e-4; the true residual sits a
    # shade above it in f32 at larger g
    rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(b, np.float64))
    assert rel < 1e-3


def test_mgpcg_3d(rng):
    g = 16
    A = convert(COO.from_scipy(laplacian_3d(g).tocoo(),
                               dtype=jnp.float32), "dia")
    n = g ** 3
    b = jnp.asarray(rng.random(n), jnp.float32)
    M = mg_preconditioner((g, g, g))
    pcg = cg(A, b, tol=1e-4, maxiter=100, precond=M)
    assert bool(pcg.converged)
    assert int(pcg.iterations) <= 15
    x = np.asarray(pcg.x, np.float64)
    r = np.asarray(b, np.float64) - laplacian_3d(g).astype(np.float64) @ x
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 2e-4


def test_mgpcg_screened(rng):
    # shifted operator (A + cI): the shift rediscretizes x4 per level
    g = 64
    c = 0.5
    Ah = laplacian_2d(g).astype(np.float64)
    import scipy.sparse as sp

    As = (Ah + c * sp.eye(g * g)).tocoo()
    A = convert(COO.from_scipy(As, dtype=jnp.float32), "dia")
    b = jnp.asarray(rng.random(g * g), jnp.float32)
    M = mg_preconditioner((g, g), shift=c)
    pcg = cg(A, b, tol=1e-6, maxiter=50, precond=M)
    assert bool(pcg.converged)
    assert int(pcg.iterations) <= 10


def test_mg_odd_grid_coarsening_stops():
    # 48 -> 24 -> 12 -> 6 -> 3: coarsening stops at the first odd/small
    # level; the preconditioner still works (Chebyshev handles a larger
    # coarsest grid)
    M = mg_preconditioner((48, 48))
    r = jnp.ones(48 * 48)
    z = M(r)
    assert z.shape == (48 * 48,)
    assert bool(jnp.all(jnp.isfinite(z)))


def test_mg_validation_errors():
    with pytest.raises(ValueError):
        mg_preconditioner((16,))            # 1-D unsupported
    with pytest.raises(ValueError):
        mg_preconditioner((16, 16), nu1=0, nu2=0)
    M = mg_preconditioner((16, 16))
    with pytest.raises(ValueError):
        M(jnp.ones(100))                    # wrong vector length
