"""Iterative solvers on top of the SpMV + BLAS-1 surface.

The reference ships BLAS-1 "solver support" it never uses — ``vec_dot`` /
``vec_axpby`` (`/root/reference/src/vec_vec.cpp`) and a ``diagonal[]``
extraction declared "for SymGS" (`/root/reference/include/matrix.h:36`).
This module closes that loop: conjugate gradients (optionally
Jacobi-preconditioned, using that diagonal), plus power iteration — all
expressed with ``lax.while_loop``/``lax.scan`` so the entire solve is ONE
compiled XLA program (no per-iteration dispatch), and all generic over any
format the :func:`~tpu_spmv.ops.spmv` dispatcher accepts.

Distributed: :func:`cg` also accepts a matvec closure, so the sharded SpMV
of ``tpu_spmv.dist`` (all-gather or halo) drops in unchanged — dots become
``psum`` reductions automatically under ``jit`` over a mesh.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.spmv import spmv

__all__ = ["CGResult", "cg", "cg_runner", "cg_runner_k",
           "jacobi_preconditioner",
           "power_iteration", "safe_dinv", "safe_dinv_host"]


class CGResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array       # int32
    residual_norm: jax.Array    # float
    converged: jax.Array        # bool


def _as_matvec(A) -> Callable:
    if callable(A) and not hasattr(A, "shape"):
        return A
    return lambda v: spmv(A, v)


def _solver_space(A):
    """``(encode, matvec, decode)`` for iterating in the kernel's native
    vector space (see ``SpmvPlan.solver_space``): streaming-strategy
    plans iterate in PADDED row space so the per-iteration pad + unpad
    passes disappear; everything else gets identities.  Pads stay
    exactly zero through the loop, so dots/norms are unchanged."""
    if hasattr(A, "solver_space"):
        enc, mv, dec = A.solver_space()
        return enc, mv, dec
    ident = lambda v: v
    return ident, _as_matvec(A), ident


def safe_dinv(d, dtype=None):
    """Elementwise safe inverse of a diagonal: zero entries invert to 1
    (the conventional Jacobi/GS fallback — a zero diagonal row gets an
    identity update instead of an inf/NaN).  Accepts host numpy or
    device arrays; this module is the one place the policy lives
    (:func:`safe_dinv_host` is its host-numpy twin for build-time use
    outside any trace)."""
    d = jnp.asarray(d, dtype) if dtype is not None else jnp.asarray(d)
    return jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 1.0)


def safe_dinv_host(d):
    """Host-numpy :func:`safe_dinv` (same zero→identity policy), for
    preconditioner BUILD time: a traced safe_dinv() result cached in a
    closure leaks a tracer when the closure is reused across several
    jitted solvers (hit in round 4, symgs_preconditioner)."""
    import numpy as np

    d = np.asarray(d, np.float64)
    return np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 1.0)


def jacobi_preconditioner(A) -> Callable:
    """M⁻¹ = 1/diag(A) — uses the reference's "for SymGS" diagonal
    (`/root/reference/include/matrix.h:36`), row-aligned (Q7 fixed)."""
    from ..formats import CSR, convert

    csr = A if isinstance(A, CSR) else convert(A, "csr")
    inv = safe_dinv(csr.diagonal())
    return lambda r: inv * r


def cg(A, b, *, x0=None, tol: float = 1e-8, maxiter: int = 1000,
       precond: Callable | None = None,
       true_tol: float | None = None, max_restarts: int = 3) -> CGResult:
    """Conjugate gradients for SPD ``A`` (format instance or matvec fn).

    The loop body is a ``lax.while_loop`` — one compiled program per
    (matrix structure, maxiter) rather than per iteration.

    ``true_tol``: optionally gate convergence on the TRUE relative
    residual ``||b - A@x|| / ||b||``.  The recursively-updated CG
    residual drifts from the true one over many iterations (measured on
    chip: recursive rel 9.9e-12 vs true 2.9e-10 after ~1000 f64
    iterations), so a recursive ``tol`` alone cannot guarantee a true-
    residual bound.  When set, the solve restarts from the current
    iterate (recomputing ``r = b - A@x`` exactly) up to ``max_restarts``
    times until the true residual meets ``true_tol`` (measured: ONE
    restart, +5 iterations, closed the 2.9e-10 → 1.7e-11 gap).  The
    returned ``residual_norm``/``converged`` then refer to the TRUE
    residual; ``iterations`` accumulates across restarts.  Set the inner
    ``tol`` a decade below ``true_tol``.  Restarting also lets the solve
    continue past ``maxiter`` (each restart gets a fresh budget).
    """
    if precond is None:
        # preconditioner closures act in the ORIGINAL vector space, so
        # the padded-space fast path only engages without one
        enc, matvec, dec = _solver_space(A)
    else:
        enc = dec = lambda v: v
        matvec = _as_matvec(A)
    b = enc(jnp.asarray(b))
    x0 = jnp.zeros_like(b) if x0 is None else enc(jnp.asarray(x0))
    M = precond if precond is not None else (lambda r: r)

    @jax.jit
    def run(b, x0):
        r0 = b - matvec(x0)
        z0 = M(r0)
        p0 = z0
        rz0 = jnp.vdot(r0, z0)
        bnorm = jnp.sqrt(jnp.vdot(b, b))
        limit = tol * jnp.maximum(bnorm, 1e-300)

        def cond(state):
            x, r, p, rz, it = state
            return (jnp.sqrt(jnp.vdot(r, r)) > limit) & (it < maxiter)

        def body(state):
            x, r, p, rz, it = state
            Ap = matvec(p)
            alpha = rz / jnp.vdot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M(r)
            rz_new = jnp.vdot(r, z)
            beta = rz_new / rz
            p = z + beta * p
            return (x, r, p, rz_new, it + 1)

        x, r, p, rz, it = lax.while_loop(cond, body, (x0, r0, p0, rz0, 0))
        rnorm = jnp.sqrt(jnp.vdot(r, r))
        return x, it, rnorm, rnorm <= limit

    x, it, rnorm, ok = run(b, x0)
    if true_tol is not None:
        @jax.jit
        def _true(b, x):
            r = b - matvec(x)
            rt = jnp.sqrt(jnp.vdot(r, r))
            limit = true_tol * jnp.maximum(jnp.sqrt(jnp.vdot(b, b)), 1e-300)
            return rt, rt <= limit

        rnorm, ok = _true(b, x)
        for _ in range(max_restarts):
            if bool(ok):
                break
            x, it2, _, _ = run(b, x)     # fresh r = b - A@x inside
            it = it + it2
            rnorm, ok = _true(b, x)
            if int(it2) == 0:
                break                    # inner tol already met: stalled
                                         # (tol must sit below true_tol)
    return CGResult(x=dec(x), iterations=it, residual_norm=rnorm,
                    converged=ok)


def cg_runner(A, *, iters: int, tol: float | None = None,
              precond: Callable | None = None,
              report_tol: float = 1e-8) -> Callable:
    """Build a REUSABLE compiled CG step for timing/serving loops.

    :func:`cg` constructs a fresh ``jax.jit`` closure per call, so every
    solve re-traces — fine for one-shot solves, wasteful when the same
    operator is solved against a stream of right-hand sides (the serving
    shape).  This factory binds ``(A, iters, tol, precond)`` ONCE and
    returns ``run(b, x0=None) -> CGResult``; repeated calls with
    same-shape operands hit the jit cache (zero retrace).

    ``tol=None`` (the timing/serving default) runs EXACTLY ``iters``
    iterations under ``lax.fori_loop`` — no convergence test in the loop
    body, so the compiled program is branch-free and its cost is
    deterministic (``converged`` is evaluated once, at the end).  With a
    ``tol``, the loop is the same early-exit ``lax.while_loop`` as
    :func:`cg` with ``maxiter=iters``.

    Reference analog: the reference ships BLAS-1 "solver support" it
    never drives (`/root/reference/src/vec_vec.cpp`); this is the
    production-loop form of driving it.

    ``report_tol`` only affects the ``converged`` flag in fixed-iteration
    mode (``tol=None``): the flag reads ``rnorm <= report_tol * ||b||``.
    The default 1e-8 is an f64-grade bar — with f32 operands a fully
    converged solve typically floors at ~1e-6..1e-7 relative, and bf16
    data floors higher still, so pass e.g. ``report_tol=1e-5`` to make
    the flag meaningful at those precisions (the solve itself is
    unaffected either way).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if precond is None:
        enc, matvec, dec = _solver_space(A)
        M = lambda r: r
    else:
        enc = dec = lambda v: v
        matvec = _as_matvec(A)
        M = precond

    @jax.jit
    def run_fixed(b, x0):
        r0 = b - matvec(x0)
        z0 = M(r0)
        rz0 = jnp.vdot(r0, z0)

        def body(_, state):
            x, r, p, rz = state
            Ap = matvec(p)
            # guarded denominators: once the residual hits exactly zero
            # (possible at fixed k past convergence) p == 0 and p·Ap == 0;
            # the guards turn the remaining iterations into no-ops
            # instead of 0/0 NaNs
            pAp = jnp.vdot(p, Ap)
            alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M(r)
            rz_new = jnp.vdot(r, z)
            p = z + (rz_new / jnp.where(rz == 0, 1.0, rz)) * p
            return (x, r, p, rz_new)

        x, r, p, rz = lax.fori_loop(0, iters, body, (x0, r0, z0, rz0))
        rnorm = jnp.sqrt(jnp.vdot(r, r))
        bnorm = jnp.sqrt(jnp.vdot(b, b))
        return x, rnorm, bnorm

    @jax.jit
    def run_tol(b, x0):
        r0 = b - matvec(x0)
        z0 = M(r0)
        rz0 = jnp.vdot(r0, z0)
        bnorm = jnp.sqrt(jnp.vdot(b, b))
        limit = tol * jnp.maximum(bnorm, 1e-300)

        def cond(state):
            x, r, p, rz, it = state
            return (jnp.sqrt(jnp.vdot(r, r)) > limit) & (it < iters)

        def body(state):
            x, r, p, rz, it = state
            Ap = matvec(p)
            # same 0/0 guards as run_fixed: f32 underflow can zero rz
            # while rnorm is still above limit (strong preconditioners),
            # and an unguarded divide would NaN-poison x
            pAp = jnp.vdot(p, Ap)
            alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M(r)
            rz_new = jnp.vdot(r, z)
            p = z + (rz_new / jnp.where(rz == 0, 1.0, rz)) * p
            return (x, r, p, rz_new, it + 1)

        x, r, p, rz, it = lax.while_loop(cond, body,
                                         (x0, r0, z0, rz0, 0))
        rnorm = jnp.sqrt(jnp.vdot(r, r))
        return x, it, rnorm, rnorm <= limit

    def run(b, x0=None) -> CGResult:
        b = enc(jnp.asarray(b))
        x0 = jnp.zeros_like(b) if x0 is None else enc(jnp.asarray(x0))
        if tol is None:
            x, rnorm, bnorm = run_fixed(b, x0)
            limit = report_tol * jnp.maximum(bnorm, 1e-300)
            return CGResult(x=dec(x), iterations=jnp.int32(iters),
                            residual_norm=rnorm, converged=rnorm <= limit)
        x, it, rnorm, ok = run_tol(b, x0)
        return CGResult(x=dec(x), iterations=it, residual_norm=rnorm,
                        converged=ok)

    return run


def cg_runner_k(A, *, precond: Callable | None = None,
                report_tol: float = 1e-8) -> Callable:
    """Like :func:`cg_runner` with ``tol=None``, but the iteration count
    is a RUNTIME argument: ``run(b, k, x0=None)``.

    One compiled program serves every ``k`` (the traced ``fori_loop``
    bound lowers to a counted ``while_loop``) — the k-differenced timing
    protocol otherwise pays a fresh remote XLA compile per k value,
    which on a slow tunnel dominates the whole measurement (round 5:
    bench_cg's escalation ladder spent 10+ minutes compiling).  The loop
    body is identical to ``cg_runner``'s fixed form; the counter compare
    it adds is noise next to the matvec."""
    if precond is None:
        enc, matvec, dec = _solver_space(A)
        M = lambda r: r
    else:
        enc = dec = lambda v: v
        matvec = _as_matvec(A)
        M = precond

    @jax.jit
    def run_k(b, x0, k):
        r0 = b - matvec(x0)
        z0 = M(r0)
        rz0 = jnp.vdot(r0, z0)

        def body(_, state):
            x, r, p, rz = state
            Ap = matvec(p)
            pAp = jnp.vdot(p, Ap)          # same 0/0 guards as cg_runner
            alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M(r)
            rz_new = jnp.vdot(r, z)
            p = z + (rz_new / jnp.where(rz == 0, 1.0, rz)) * p
            return (x, r, p, rz_new)

        x, r, p, rz = lax.fori_loop(0, k, body, (x0, r0, z0, rz0))
        rnorm = jnp.sqrt(jnp.vdot(r, r))
        bnorm = jnp.sqrt(jnp.vdot(b, b))
        return x, rnorm, bnorm

    def run(b, k, x0=None) -> CGResult:
        b = enc(jnp.asarray(b))
        x0 = jnp.zeros_like(b) if x0 is None else enc(jnp.asarray(x0))
        x, rnorm, bnorm = run_k(b, x0, jnp.int32(k))
        limit = report_tol * jnp.maximum(bnorm, 1e-300)
        return CGResult(x=dec(x), iterations=jnp.int32(k),
                        residual_norm=rnorm, converged=rnorm <= limit)

    return run


def power_iteration(A, *, key=None, iters: int = 50,
                    n: int | None = None) -> tuple[jax.Array, jax.Array]:
    """Dominant eigenvalue/vector via ``lax.scan`` (also the shape of the
    bench harness's chained-timing loop).  Matvec-closure callers (no
    ``.shape``) must pass ``n``."""
    enc, matvec, dec = _solver_space(A)
    n = A.shape[0] if hasattr(A, "shape") else n
    if n is None:
        raise ValueError("power_iteration needs n= for matvec closures")
    if key is None:
        key = jax.random.key(0)
    v0 = enc(jax.random.uniform(key, (n,)))

    @jax.jit
    def run(v0):
        def step(v, _):
            w = matvec(v)
            nrm = jnp.sqrt(jnp.vdot(w, w))
            v_new = w / jnp.maximum(nrm, 1e-300)
            return v_new, nrm

        v, norms = lax.scan(step, v0 / jnp.sqrt(jnp.vdot(v0, v0)),
                            length=iters)
        lam = jnp.vdot(v, matvec(v))
        return lam, v

    lam, v = run(v0)
    return lam, dec(v)
