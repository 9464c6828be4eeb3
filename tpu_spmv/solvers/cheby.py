"""Chebyshev iteration: the TPU-idiomatic stand-in for Gauss–Seidel.

The reference extracts a ``diagonal[]`` "for SymGS" it never uses
(`/root/reference/include/matrix.h:36`, filled at
`/root/reference/src/matrix.cpp:146-153`).  A symmetric Gauss–Seidel
sweep is a forward+backward *triangular solve* — an inherently
sequential recurrence that is catastrophic on a vector machine (one
row at a time, no lanes).  The established accelerator answer is a
**Chebyshev polynomial** in ``D⁻¹A``: same smoothing role, but the
whole sweep is k SpMVs + axpbys with NO inner-loop dot products — no
reductions, no host syncs, a straight-line ``lax.scan`` the compiler
fuses end-to-end.  On this backend that matters twice over: every
reduction in a solver loop is a cross-lane collapse, and the chained
SpMV is exactly the shape the fast kernels are tuned for.

Two surfaces:

- :func:`chebyshev` — standalone solver for SPD systems given an
  eigenvalue interval ``[lmin, lmax]`` (the classic three-term
  recurrence; see Saad, *Iterative Methods*, alg. 12.1 — public
  algorithm, no reference-code counterpart).
- :func:`chebyshev_preconditioner` — a fixed-degree polynomial
  preconditioner ``M⁻¹ ≈ p(D⁻¹A) D⁻¹`` for :func:`~tpu_spmv.solvers.cg`:
  estimates ``lmax`` with a few power iterations on ``D⁻¹A`` (one-time),
  then each CG iteration applies ``degree`` reduction-free SpMVs.
  Cuts CG's dot-product count per unit of residual reduction — the
  standard trade when reductions are the bottleneck, as they are on a
  mesh (every ``vdot`` is a ``psum``) and on a dispatch-bound chip.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.spmv import spmv
from .cg import _as_matvec

__all__ = ["ChebyshevResult", "chebyshev", "chebyshev_preconditioner"]


class ChebyshevResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array       # int32
    residual_norm: jax.Array    # float
    converged: jax.Array        # bool


def chebyshev(A, b, *, lmin: float, lmax: float, x0=None,
              tol: float = 1e-8, maxiter: int = 1000) -> ChebyshevResult:
    """Chebyshev iteration for SPD ``A`` with spectrum in ``[lmin, lmax]``.

    The loop body is one SpMV + two axpbys — **no dot products**, so on
    a device mesh there is no per-iteration ``psum`` at all (the only
    reduction is the convergence check, folded into ``while_loop``'s
    cond).  ``A`` may be any format the :func:`~tpu_spmv.ops.spmv`
    dispatcher accepts, or a matvec closure.

    Wrong/loose ``[lmin, lmax]`` bounds degrade convergence (and can
    diverge if the spectrum leaks outside) — they are the price of
    dropping the reductions.  Get ``lmax`` from
    :func:`~tpu_spmv.solvers.power_iteration` (an upper bound after a
    small safety factor); for Laplacian-like systems ``lmin`` can be a
    crude lower bound without much loss.
    """
    # strict lmin < lmax: the recurrence divides by delta = (lmax-lmin)/2,
    # so a degenerate interval would produce inf/NaN (ADVICE r2)
    if not (0.0 < lmin < lmax):
        raise ValueError(f"need 0 < lmin < lmax, got [{lmin}, {lmax}]")
    from .cg import _solver_space

    # streaming-strategy plans iterate in padded row space (pads stay
    # exactly zero, so the convergence check's norm is unchanged)
    enc, matvec, dec = _solver_space(A)
    b = enc(jnp.asarray(b))
    x0 = jnp.zeros_like(b) if x0 is None else enc(jnp.asarray(x0))
    theta = 0.5 * (lmax + lmin)        # interval center
    delta = 0.5 * (lmax - lmin)        # interval half-width

    @jax.jit
    def run(b, x0):
        r0 = b - matvec(x0)
        bnorm = jnp.sqrt(jnp.vdot(b, b))
        limit = tol * jnp.maximum(bnorm, 1e-300)
        # first step: x1 = x0 + (1/theta) r0
        p0 = r0 / theta
        x1 = x0 + p0
        r1 = r0 - matvec(p0)
        sigma = theta / jnp.maximum(delta, 1e-300)
        rho0 = 1.0 / sigma

        def cond(st):
            x, r, p, rho, it = st
            return (jnp.sqrt(jnp.vdot(r, r)) > limit) & (it < maxiter)

        def body(st):
            x, r, p, rho, it = st
            rho_new = 1.0 / (2.0 * sigma - rho)
            p = rho_new * (2.0 * r / delta + rho * p)
            x = x + p
            r = r - matvec(p)
            return (x, r, p, rho_new, it + 1)

        x, r, p, rho, it = lax.while_loop(
            cond, body, (x1, r1, p0, rho0, jnp.int32(1)))
        rnorm = jnp.sqrt(jnp.vdot(r, r))
        return x, it, rnorm, rnorm <= limit

    x, it, rnorm, ok = run(b, x0)
    return ChebyshevResult(x=dec(x), iterations=it, residual_norm=rnorm,
                           converged=ok)


def chebyshev_preconditioner(A, *, degree: int = 4,
                             lmax: float | None = None,
                             power_iters: int = 20,
                             safety: float = 1.1,
                             lmin_frac: float = 1.0 / 30.0,
                             dinv=None, n: int | None = None) -> Callable:
    """Degree-``degree`` Chebyshev polynomial preconditioner for CG.

    Applies ``z ≈ (D⁻¹A)⁻¹ D⁻¹ r`` restricted to the eigenvalue window
    ``[lmin_frac·lmax, lmax]`` of the Jacobi-scaled operator — the
    standard smoothed-aggregation recipe (targets the upper part of the
    spectrum; CG mops up the few low modes).  Each application is exactly
    ``degree`` SpMVs with zero reductions (the resulting polynomial in
    ``D⁻¹A`` has degree ``degree``), and because it runs *inside*
    CG's ``while_loop`` body the whole polynomial inlines into one XLA
    region.

    ``lmax`` (of ``D⁻¹A``) is estimated once with ``power_iters`` power
    steps and inflated by ``safety`` (Chebyshev must not see eigenvalues
    above the window's top).  For SPD matrices with nonzero diagonal
    ``lmax(D⁻¹A) <= 2`` always works as a fallback.

    The returned closure is a valid ``precond=`` for
    :func:`~tpu_spmv.solvers.cg` (the polynomial in an SPD operator is
    itself SPD, preserving CG's requirements).

    ``A`` may also be a matvec closure (e.g. a packed ``SpmvPlan`` whose
    format cannot ``convert()`` to CSR) — pass ``dinv`` (inverse
    diagonal, device array) and ``n`` alongside it.
    """
    if degree < 1:
        raise ValueError("degree must be >= 1")
    from .cg import power_iteration

    if dinv is None:
        from ..formats import CSR, convert
        from .cg import safe_dinv

        csr = A if isinstance(A, CSR) else convert(A, "csr")
        dinv = safe_dinv(csr.diagonal())
        n = csr.shape[0]
        matvec = lambda v: spmv(csr, v)
    else:
        if n is None:
            raise ValueError("matvec-closure form needs n=")
        matvec = _as_matvec(A)
    scaled = lambda v: dinv * matvec(v)   # D⁻¹A (SPD in the D-inner product)
    if lmax is None:
        lam, _ = power_iteration(scaled, iters=power_iters, n=n)
        lmax = float(jnp.real(lam)) * safety
        if not (lmax > 0.0) or not jnp.isfinite(lmax):
            lmax = 2.0 * safety                # Gershgorin-safe fallback
    lmin = lmin_frac * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / max(delta, 1e-300)

    def apply(r):
        # fixed-degree Chebyshev recurrence on z' = p(D⁻¹A) D⁻¹ r;
        # a Python loop over `degree` steps — unrolled at trace time
        # (degree is static), zero reductions.  Each iteration performs
        # one SpMV, so one apply() = `degree` SpMVs and the polynomial
        # degree matches the parameter (ADVICE r2 off-by-one).
        rr = dinv * r
        p = rr / theta
        z = p
        rho = 1.0 / sigma
        for _ in range(degree):
            rr = rr - scaled(p)
            rho_new = 1.0 / (2.0 * sigma - rho)
            p = rho_new * (2.0 * rr / delta + rho * p)
            z = z + p
            rho = rho_new
        return z

    return apply
