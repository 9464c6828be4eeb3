"""Nonsymmetric Krylov solvers — BiCGSTAB and restarted GMRES.

CG (`solvers/cg.py`) covers the SPD case the reference's BLAS-1 "solver
support" was aimed at (`/root/reference/src/vec_vec.cpp`, never invoked by
its driver); real workloads also carry nonsymmetric operators (convection
terms, circuit matrices, PageRank-style systems).  Both solvers here need
ONLY the forward matvec — they run unchanged on every planner strategy,
including the packed Pallas kernels (GPR/PSELL) that have no cheap
transpose.

TPU-first shape, same as CG: the whole solve is ONE compiled XLA program —
``lax.while_loop`` over iterations (BiCGSTAB) or over restart cycles with a
``lax.fori_loop`` Arnoldi inner loop (GMRES); no per-iteration dispatch, no
data-dependent Python control flow.  GMRES keeps the Krylov basis as a
static ``[m+1, n]`` array and tracks the residual with Givens rotations, so
each cycle's least-squares problem never leaves registers/VMEM.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .cg import _as_matvec

__all__ = ["KrylovResult", "bicgstab", "gmres"]


class KrylovResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array       # int32 (GMRES: total inner steps)
    residual_norm: jax.Array    # float
    converged: jax.Array        # bool


def bicgstab(A, b, *, x0=None, tol: float = 1e-8, maxiter: int = 1000,
             precond: Callable | None = None) -> KrylovResult:
    """BiCGSTAB (van der Vorst) for general square ``A``.

    ``A`` is a format instance, an :class:`~tpu_spmv.ops.auto.SpmvPlan`,
    or a matvec closure; ``precond`` (optional) applies ``M⁻¹`` — e.g.
    :func:`~tpu_spmv.solvers.cg.jacobi_preconditioner`.  Breakdown
    (``rho → 0`` / ``omega → 0``) exits the loop with ``converged`` False
    rather than NaN-ing the state.
    """
    matvec = _as_matvec(A)
    b = jnp.asarray(b)
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    M = precond if precond is not None else (lambda r: r)
    eps = jnp.finfo(b.dtype).tiny

    @jax.jit
    def run(b, x0):
        r0 = b - matvec(x0)
        rhat = r0                        # fixed shadow residual
        bnorm = jnp.sqrt(jnp.vdot(b, b))
        limit = tol * jnp.maximum(bnorm, 1e-300)
        one = jnp.ones((), b.dtype)
        state0 = (x0, r0, r0 * 0, r0 * 0, one, one, one, 0, False)

        def cond(st):
            x, r, p, v, rho, alpha, omega, it, broke = st
            return ((jnp.sqrt(jnp.vdot(r, r)) > limit) & (it < maxiter)
                    & jnp.logical_not(broke))

        def body(st):
            x, r, p, v, rho, alpha, omega, it, _ = st
            rho_new = jnp.vdot(rhat, r)
            broke = jnp.abs(rho_new) <= eps
            beta = jnp.where(broke, 0,
                             (rho_new / jnp.where(broke, 1, rho))
                             * (alpha / omega))
            p = r + beta * (p - omega * v)
            ph = M(p)
            v = matvec(ph)
            denom = jnp.vdot(rhat, v)
            broke = broke | (jnp.abs(denom) <= eps)
            alpha = jnp.where(broke, 0, rho_new / jnp.where(broke, 1, denom))
            s = r - alpha * v
            sh = M(s)
            t = matvec(sh)
            tt = jnp.vdot(t, t)
            broke_o = tt <= eps
            omega_new = jnp.where(broke_o, 0,
                                  jnp.vdot(t, s) / jnp.where(broke_o, 1, tt))
            x = x + alpha * ph + omega_new * sh
            r = s - omega_new * t
            # an exact solve mid-step (s == 0) is success, not breakdown
            done = jnp.sqrt(jnp.vdot(s, s)) <= limit
            x = jnp.where(done, x - omega_new * sh, x)
            r = jnp.where(done, s, r)
            return (x, r, p, v, rho_new, alpha,
                    jnp.where(broke_o, 1, omega_new), it + 1,
                    (broke | broke_o) & jnp.logical_not(done))

        x, r, *_, it, broke = lax.while_loop(cond, body, state0)
        rnorm = jnp.sqrt(jnp.vdot(r, r))
        return x, it, rnorm, rnorm <= limit

    x, it, rnorm, ok = run(b, x0)
    return KrylovResult(x=x, iterations=it, residual_norm=rnorm,
                        converged=ok)


def gmres(A, b, *, x0=None, tol: float = 1e-8, restart: int = 30,
          maxiter: int = 1000, precond: Callable | None = None
          ) -> KrylovResult:
    """Restarted GMRES(m) for general square ``A``.

    Right-preconditioned (``A M⁻¹ u = b``, ``x = M⁻¹ u``) so the residual
    tracked by the Givens recurrence is the TRUE residual.  Each cycle runs
    a full ``restart``-step Arnoldi as a ``lax.fori_loop`` (static shapes;
    steps after convergence/breakdown are masked to no-ops), then updates
    ``x`` through a triangular solve of the rotated Hessenberg — the
    while_loop over cycles stops once the tracked residual passes ``tol``.
    """
    matvec = _as_matvec(A)
    b = jnp.asarray(b)
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    M = precond if precond is not None else (lambda r: r)
    m = int(restart)
    n = b.shape[0]
    dt = b.dtype
    eps = jnp.finfo(dt).tiny

    @jax.jit
    def run(b, x0):
        bnorm = jnp.sqrt(jnp.vdot(b, b))
        limit = tol * jnp.maximum(bnorm, 1e-300)

        def cycle(carry):
            x, _, it, _ = carry
            r = b - matvec(x)
            beta = jnp.sqrt(jnp.vdot(r, r))
            V0 = jnp.zeros((m + 1, n), dt).at[0].set(
                r / jnp.maximum(beta, eps))
            H0 = jnp.zeros((m + 1, m), dt)
            cs0 = jnp.ones((m,), dt)
            sn0 = jnp.zeros((m,), dt)
            g0 = jnp.zeros((m + 1,), dt).at[0].set(beta)

            def arnoldi(j, st):
                V, H, cs, sn, g, alive, cnt = st
                w = matvec(M(V[j]))
                # one-shot CLASSICAL Gram-Schmidt against the filled
                # basis rows (vectorizes as a single masked contraction;
                # CGS loses orthogonality faster than MGS in f32, which
                # is why the cycle exit re-checks the TRUE residual)
                idx = jnp.arange(m + 1)
                mask = (idx <= j).astype(dt)
                h = (V * w[None, :]).sum(axis=1) * mask       # [m+1]
                w = w - (h[:, None] * V).sum(axis=0)
                hnext = jnp.sqrt(jnp.vdot(w, w))
                h = h.at[j + 1].set(hnext)
                V = V.at[j + 1].set(jnp.where(hnext > eps, w / hnext, 0))
                # apply the accumulated Givens rotations to column j
                def rot(i, hh):
                    hi = cs[i] * hh[i] + sn[i] * hh[i + 1]
                    hi1 = -sn[i] * hh[i] + cs[i] * hh[i + 1]
                    return hh.at[i].set(hi).at[i + 1].set(hi1)

                h = lax.fori_loop(0, j, rot, h)
                denom = jnp.sqrt(h[j] ** 2 + hnext ** 2)
                c = jnp.where(denom > eps, h[j] / denom, 1.0)
                s = jnp.where(denom > eps, hnext / denom, 0.0)
                h = h.at[j].set(c * h[j] + s * hnext).at[j + 1].set(0)
                gj = g[j]
                g = g.at[j].set(c * gj).at[j + 1].set(-s * gj)
                # mask: past convergence/breakdown the step is a no-op
                H = jnp.where(alive, H.at[:, j].set(h), H)
                cs = jnp.where(alive, cs.at[j].set(c), cs)
                sn = jnp.where(alive, sn.at[j].set(s), sn)
                g = jnp.where(alive, g, st[4])
                V = jnp.where(alive, V, st[0])
                cnt = cnt + alive.astype(cnt.dtype)   # real inner steps
                alive = alive & (jnp.abs(g[j + 1]) > limit) & (hnext > eps)
                return (V, H, cs, sn, g, alive, cnt)

            V, H, cs, sn, g, _, cnt = lax.fori_loop(
                0, m, arnoldi, (V0, H0, cs0, sn0, g0, beta > limit,
                                jnp.zeros((), jnp.int32)))
            # solve R y = g on the rotated Hessenberg's top m x m block.
            # Columns never filled (converged/broke down mid-cycle) have a
            # zero diagonal: give them a unit diagonal and a zero rhs so
            # their y components are exactly zero (their off-diagonal
            # coupling is zero already — masked steps never wrote H).
            diag = jnp.abs(jnp.diagonal(H[:m, :]))
            filled = (diag > eps).astype(dt)
            R = H[:m, :] + jnp.diag(1 - filled)
            y = jax.scipy.linalg.solve_triangular(R, g[:m] * filled,
                                                  lower=False)
            x = x + M((y[:, None] * V[:m]).sum(axis=0))
            rnorm = jnp.where(jnp.any(jnp.isnan(g)),
                              jnp.array(jnp.inf, dt), jnp.abs(g[m]))
            # count the steps actually TAKEN (masked no-op steps after
            # convergence/breakdown don't inflate `iterations`)
            return (x, rnorm, it + cnt, beta)

        def cond(carry):
            _, rnorm, it, prev = carry
            return (rnorm > limit) & (it < maxiter) & (rnorm < prev)

        x0_, r0 = x0, b - matvec(x0)
        carry = (x0_, jnp.sqrt(jnp.vdot(r0, r0)).astype(dt),
                 jnp.zeros((), jnp.int32), jnp.array(jnp.inf, dt))
        x, rnorm, it, _ = lax.while_loop(cond, cycle, carry)
        # report the true residual (the Givens estimate drifts in f32)
        rtrue = b - matvec(x)
        rnorm = jnp.sqrt(jnp.vdot(rtrue, rtrue))
        return x, it, rnorm, rnorm <= limit

    x, it, rnorm, ok = run(b, x0)
    return KrylovResult(x=x, iterations=it, residual_norm=rnorm,
                        converged=ok)
