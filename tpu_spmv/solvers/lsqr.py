"""LSQR — least-squares / rectangular solves via Golub-Kahan
bidiagonalization (Paige & Saunders 1982).

Needs ``A^T v`` as well as ``A v``; the transpose comes for free on the
layout-symmetric formats (:func:`tpu_spmv.ops.transpose.transpose` —
CSR^T is CSC in place, streaming DIA packs transpose on device), which is
exactly why the framework carries a first-class transpose where the
reference (`/root/reference`) has none.  Same TPU shape as the other
solvers: one ``lax.while_loop``, no per-iteration dispatch.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .cg import _as_matvec

__all__ = ["LSQRResult", "lsqr"]


class LSQRResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array
    residual_norm: jax.Array     # ||b - A x||
    atr_norm: jax.Array          # ||A^T (b - A x)|| (least-squares optimality)
    converged: jax.Array


def _norm(v):
    return jnp.sqrt(jnp.vdot(v, v))


def lsqr(A, b, *, At=None, x0=None, tol: float = 1e-8,
         maxiter: int = 1000) -> LSQRResult:
    """Solve ``min_x ||A x - b||_2`` (square, over- or underdetermined).

    ``A`` is a format instance, an :class:`~tpu_spmv.ops.auto.SpmvPlan`,
    or a matvec closure.  ``At`` (the transpose operator) defaults to
    ``A.transpose()`` for plans / :func:`~tpu_spmv.ops.transpose.transpose`
    for formats; pass a closure for matvec-only operators.

    Converges when ``||r|| <= tol * ||b||`` (consistent systems) or
    ``||A^T r|| <= tol * ||A|| * ||r||`` (least-squares optimality), the
    scipy-style dual criterion.
    """
    matvec = _as_matvec(A)
    if At is None:
        if hasattr(A, "transpose"):
            At = A.transpose()
        elif hasattr(A, "shape"):
            from ..ops.transpose import transpose as _t

            At = _t(A)
        else:
            raise ValueError("matvec-closure A needs an explicit At=")
    rmatvec = _as_matvec(At)
    b = jnp.asarray(b)
    dt = b.dtype
    eps = jnp.finfo(dt).tiny

    @jax.jit
    def run(b, x0):
        u0 = b if x0 is None else b - matvec(x0)
        beta0 = _norm(u0)
        u0 = u0 / jnp.maximum(beta0, eps)
        v0 = rmatvec(u0)
        alpha0 = _norm(v0)
        v0 = v0 / jnp.maximum(alpha0, eps)
        xinit = (jnp.zeros_like(v0) if x0 is None else jnp.asarray(x0))
        bnorm = _norm(b)

        # state: x, w, u, v, alpha, rhobar, phibar, anorm2, it, done
        st0 = (xinit, v0, u0, v0, alpha0, alpha0, beta0,
               alpha0 * alpha0, 0, beta0 <= tol * bnorm)

        def cond(st):
            *_, it, done = st
            return jnp.logical_not(done) & (it < maxiter)

        def body(st):
            x, w, u, v, alpha, rhobar, phibar, anorm2, it, _ = st
            u = matvec(v) - alpha * u
            beta = _norm(u)
            u = u / jnp.maximum(beta, eps)
            v_new = rmatvec(u) - beta * v
            alpha_new = _norm(v_new)
            v_new = v_new / jnp.maximum(alpha_new, eps)
            rho = jnp.sqrt(rhobar * rhobar + beta * beta)
            c = rhobar / jnp.maximum(rho, eps)
            s = beta / jnp.maximum(rho, eps)
            theta = s * alpha_new
            rhobar = -c * alpha_new
            phi = c * phibar
            phibar = s * phibar
            x = x + (phi / jnp.maximum(rho, eps)) * w
            w = v_new - (theta / jnp.maximum(rho, eps)) * w
            anorm2 = anorm2 + alpha * alpha + beta * beta
            # ||A^T r|| = phibar * |rhobar| after the rotation
            arnorm = phibar * jnp.abs(rhobar)
            done = ((phibar <= tol * jnp.maximum(bnorm, eps))
                    | (arnorm <= tol * jnp.sqrt(anorm2)
                       * jnp.maximum(phibar, eps))
                    | (beta <= eps) | (alpha_new <= eps))
            return (x, w, u, v_new, alpha_new, rhobar, phibar, anorm2,
                    it + 1, done)

        x, w, u, v, alpha, rhobar, phibar, anorm2, it, done = \
            lax.while_loop(cond, body, st0)
        r = b - matvec(x)
        rnorm = _norm(r)
        atr = _norm(rmatvec(r))
        ok = ((rnorm <= 10 * tol * jnp.maximum(bnorm, eps))
              | (atr <= 10 * tol * jnp.sqrt(anorm2)
                 * jnp.maximum(rnorm, eps)))
        return x, it, rnorm, atr, ok

    x, it, rnorm, atr, ok = run(b, None if x0 is None else jnp.asarray(x0))
    return LSQRResult(x=x, iterations=it, residual_norm=rnorm,
                      atr_norm=atr, converged=ok)
