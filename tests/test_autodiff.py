"""Differentiability of the compute surface — a capability no C++ SpMV
library has, and free here because formats are pytrees and kernels are
pure XLA: ``grad``/``jvp``/``vmap`` compose with SpMV out of the box."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_spmv as ts
from tpu_spmv import utils

FORMAT_NAMES = ["coo", "csr", "csc", "ell", "dia", "bsr", "bdia"]


@pytest.fixture(scope="module")
def mat():
    return utils.laplacian_2d(8, 7)


@pytest.mark.parametrize("fmt", FORMAT_NAMES)
def test_grad_wrt_x(mat, fmt, rng):
    """d/dx [ 0.5 ||A x||^2 ] = A^T A x — checked against scipy."""
    A = ts.convert(ts.COO.from_scipy(mat), fmt)
    x = rng.standard_normal(mat.shape[1])

    def loss(v):
        y = ts.spmv(A, v)
        return 0.5 * jnp.vdot(y, y)

    g = jax.grad(loss)(jnp.asarray(x))
    ref = mat.T @ (mat @ x)
    np.testing.assert_allclose(np.asarray(g), ref, rtol=1e-10, atol=1e-11)


@pytest.mark.parametrize("fmt", ["csr", "dia", "bdia"])
def test_grad_wrt_values(mat, fmt, rng):
    """Gradients flow into the matrix VALUES leaf (sparsity-pattern-fixed
    matrix learning — e.g. learned stencils)."""
    A = ts.convert(ts.COO.from_scipy(mat), fmt)
    x = jnp.asarray(rng.standard_normal(mat.shape[1]))
    t = jnp.asarray(rng.standard_normal(mat.shape[0]))

    def loss(data):
        import dataclasses

        A2 = dataclasses.replace(A, data=data)
        return jnp.vdot(t, ts.spmv(A2, x))

    g = jax.grad(loss)(A.data)
    assert g.shape == A.data.shape
    # directional check: d loss/d data[i] for entry (r, c) is t[r] * x[c]
    eps = 1e-6
    d0 = np.zeros(A.data.shape)
    flat_idx = np.unravel_index(0, A.data.shape)
    d0[flat_idx] = eps
    f0 = float(loss(A.data))
    f1 = float(loss(A.data + jnp.asarray(d0)))
    np.testing.assert_allclose(
        np.asarray(g)[flat_idx], (f1 - f0) / eps, rtol=1e-4, atol=1e-7
    )


def test_jvp_matches_spmv(mat, rng):
    """SpMV is linear: its JVP in x IS SpMV."""
    A = ts.convert(ts.COO.from_scipy(mat), "csr")
    x = jnp.asarray(rng.standard_normal(mat.shape[1]))
    dx = jnp.asarray(rng.standard_normal(mat.shape[1]))
    _, tangent = jax.jvp(lambda v: ts.spmv(A, v), (x,), (dx,))
    np.testing.assert_allclose(
        np.asarray(tangent), np.asarray(ts.spmv(A, dx)), rtol=1e-12
    )


def test_vmap_over_rhs(mat, rng):
    """vmap(spmv) over a batch of vectors == spmm."""
    A = ts.convert(ts.COO.from_scipy(mat), "csr")
    X = jnp.asarray(rng.standard_normal((mat.shape[1], 6)))
    Y1 = jax.vmap(lambda v: ts.spmv(A, v), in_axes=1, out_axes=1)(X)
    Y2 = ts.spmm(A, X)
    np.testing.assert_allclose(np.asarray(Y1), np.asarray(Y2), rtol=1e-12)


def test_grad_through_cg(rng):
    """Differentiating through a whole CG solve (implicit-function use
    cases); small system so unrolled while_loop grads stay stable."""
    mat = utils.laplacian_2d(4, 4)
    A = ts.convert(ts.COO.from_scipy(mat), "csr")
    b = jnp.asarray(rng.standard_normal(mat.shape[0]))

    def solve_norm(bv):
        from tpu_spmv.solvers import cg

        # fixed iteration count → differentiable scan-like structure
        x = bv
        r = bv - ts.spmv(A, x)
        p = r
        rr = jnp.vdot(r, r)
        for _ in range(10):
            Ap = ts.spmv(A, p)
            alpha = rr / jnp.vdot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            rr_new = jnp.vdot(r, r)
            p = r + (rr_new / rr) * p
            rr = rr_new
        return jnp.vdot(x, x)

    g = jax.grad(solve_norm)(b)
    assert np.all(np.isfinite(np.asarray(g)))


def test_plan_matvec_differentiable_gpr():
    # packed GPR is not JAX-traceable; the plan-level custom VJP routes
    # x_bar through the transpose pack — gradient must match the natively
    # differentiable XLA CSR path
    from tpu_spmv.ops.auto import plan_spmv
    from tpu_spmv import utils

    mat = utils.random_sparse(300, 260, 0.05, seed=21).astype(np.float32)
    plan = plan_spmv(mat, use_pallas=True)
    if plan.strategy != "gpr":   # force the packed arm
        from tpu_spmv.kernels import gpr as _gpr
        from tpu_spmv.ops.auto import plan_from_matrix

        plan = plan_from_matrix(_gpr.pack_gpr(mat), "gpr")
    plan_T = plan_spmv(mat.T.tocsr(), use_pallas=True)
    mv = plan.matvec_differentiable(plan_T)

    x = jnp.asarray(np.random.default_rng(3).random(260), jnp.float32)
    w = jnp.asarray(np.random.default_rng(4).random(300), jnp.float32)

    g = jax.grad(lambda v: jnp.vdot(w, mv(v)))(x)
    # d/dx <w, A x> = A^T w
    ref = mat.T.astype(np.float64) @ np.asarray(w, np.float64)
    np.testing.assert_allclose(np.asarray(g, np.float64), ref,
                               rtol=2e-4, atol=2e-5)


def test_plan_matvec_differentiable_auto_transpose():
    # strategies with an in-place transpose derive plan_T automatically
    from tpu_spmv.ops.auto import plan_spmv
    from tpu_spmv import utils

    mat = utils.laplacian_2d(12).astype(np.float32)
    plan = plan_spmv(mat)
    mv = plan.matvec_differentiable()
    x = jnp.asarray(np.random.default_rng(5).random(144), jnp.float32)
    g = jax.grad(lambda v: jnp.sum(mv(v) ** 2))(x)
    A64 = mat.astype(np.float64)
    xv = np.asarray(x, np.float64)
    ref = 2.0 * (A64.T @ (A64 @ xv))
    np.testing.assert_allclose(np.asarray(g, np.float64), ref,
                               rtol=2e-4, atol=2e-5)


def test_learn_stencil_psdia(rng):
    # end-to-end "fitted stencil": recover the 5-point Poisson operator
    # from (x, A x) pairs by gradient descent THROUGH the periodic
    # streaming kernel's custom VJP (pattern cotangent) — the matrix-
    # learning capability the dia_stream VJPs were built for
    from tpu_spmv import utils
    from tpu_spmv.kernels import dia_stream
    from tpu_spmv import COO, convert
    import dataclasses

    import optax

    g = 16
    m = utils.laplacian_2d(g)
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    P_true = dia_stream.pack_psdia(dia, period=g)

    X = jnp.asarray(rng.standard_normal((16, g * g)), jnp.float32)
    Y = jax.vmap(lambda v: dia_stream.spmv_psdia(P_true, v,
                                                 interpret=True))(X)

    # start from a wrong pattern of the same sparsity structure
    P0 = dataclasses.replace(
        P_true, pattern=jnp.zeros_like(P_true.pattern)
        .at[P_true.offsets.index(0)].set(1.0))

    def loss(pat):
        Pf = dataclasses.replace(P0, pattern=pat)
        pred = jax.vmap(lambda v: dia_stream.spmv_psdia(Pf, v,
                                                        interpret=True))(X)
        return jnp.mean((pred - Y) ** 2)

    opt = optax.adam(optax.cosine_decay_schedule(0.3, 800))
    pat = P0.pattern
    state = opt.init(pat)
    vg = jax.jit(jax.value_and_grad(loss))
    for _ in range(800):
        _, grad = vg(pat)
        upd, state = opt.update(grad, state)
        pat = optax.apply_updates(pat, upd)
    # the fitted OPERATOR generalizes to held-out inputs (raw pattern
    # slots that never touch a real row carry no gradient and keep
    # their init — only the operator's action is identified).
    # Measured: train loss ~1e-14, held-out rel ~1e-7 (exact recovery).
    Xh = jnp.asarray(rng.standard_normal((4, g * g)), jnp.float32)
    Pf = dataclasses.replace(P0, pattern=pat)
    pred = jax.vmap(lambda v: dia_stream.spmv_psdia(Pf, v,
                                                    interpret=True))(Xh)
    truth = jax.vmap(lambda v: dia_stream.spmv_psdia(P_true, v,
                                                     interpret=True))(Xh)
    rel = float(jnp.max(jnp.abs(pred - truth)) / jnp.max(jnp.abs(truth)))
    assert rel < 1e-4, rel
