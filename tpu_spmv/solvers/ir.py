"""Mixed-precision iterative refinement: bf16 inner solves, f32 truth.

The reference runs everything in one precision (``real_t`` is a compile
time typedef, `/root/reference/include/common.h`); on TPU the economics
reward SPLITTING precisions — the bf16-data streaming SDIA kernel moves
half the matrix bytes and measured 1.32x the f32 kernel (bench.py,
``bf16_data_ms_per_spmv``), but a straight bf16-data CG stalls around
the bf16 rounding floor (~3 decimal digits).  Classical iterative
refinement (Wilkinson; Carson & Higham 2018 for the 3-precision
analysis) recovers full f32 accuracy while doing almost all matrix
traffic in bf16:

    x = 0
    repeat:  r = b - A_hi @ x        # ONE hi-precision SpMV per cycle
             d ~= solve(A_lo, r)     # k-step CG on the bf16-data plan
             x = x + d

Each outer cycle contracts the error by roughly the inner solver's
contraction factor; the bf16 data perturbation only bounds the LIMIT of
the inner correction's accuracy per cycle, not of ``x`` itself, because
the residual is always recomputed against the hi-precision operator.

The whole solve — outer ``lax.while_loop``, inner fixed-k
``lax.fori_loop`` CG — is ONE compiled XLA program; per-cycle cost is
deterministic (inner loop is branch-free, guarded denominators make
post-convergence iterations no-ops).

When both operators are streaming-strategy plans over the same padded
row space, the entire refinement iterates in that space (one pad/unpad
for the whole solve — see ``SpmvPlan.solver_space``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .cg import _as_matvec, _solver_space

__all__ = ["IRResult", "ir_solve", "ir_runner"]


class IRResult(NamedTuple):
    x: jax.Array
    outer_iterations: jax.Array   # int32 — refinement cycles run
    residual_norm: jax.Array      # float — TRUE (hi-precision) residual
    converged: jax.Array          # bool


def _paired_spaces(A_hi, A_lo, n: int):
    """Encode/decode + the two matvecs, in a SHARED padded space when the
    hi and lo plans pad identically (same matrix, same streaming
    strategy -> same padded length); identity space otherwise."""
    enc_hi, mv_hi, dec_hi = _solver_space(A_hi)
    enc_lo, mv_lo, _ = _solver_space(A_lo)
    probe = jax.ShapeDtypeStruct((n,), jnp.float32)
    try:
        same = (jax.eval_shape(enc_hi, probe).shape
                == jax.eval_shape(enc_lo, probe).shape)
        # Shape equality alone is necessary but not sufficient: a future
        # strategy could pad to the same length while PERMUTING rows
        # differently, silently mis-pairing the spaces.  Require the
        # same strategy and, for the streaming plans, identical diagonal
        # structure (equal L => identical row blocking and padding map).
        st_hi = getattr(A_hi, "strategy", None)
        st_lo = getattr(A_lo, "strategy", None)
        same = same and st_hi == st_lo
        if same and st_hi in ("dia_stream", "pdia_stream"):
            same = (A_hi.matrix.L == A_lo.matrix.L
                    and A_hi.matrix.rb == A_lo.matrix.rb
                    and tuple(A_hi.matrix.offsets)
                    == tuple(A_lo.matrix.offsets))
    except Exception:
        same = False
    if same:
        return enc_hi, dec_hi, mv_hi, mv_lo
    ident = lambda v: v
    return ident, ident, _as_matvec(A_hi), _as_matvec(A_lo)


def ir_runner(A, *, low=None, inner_iters: int = 16, maxiter: int = 40,
              tol: float = 1e-7, precond: Callable | None = None,
              n: int | None = None) -> Callable:
    """Build a reusable compiled mixed-precision refinement solve.

    ``A`` — the hi-precision operator (format / SpmvPlan / matvec
    closure): defines the residual, hence the accuracy ``x`` converges
    to.  ``low`` — the low-precision operator the inner CG iterates on
    (typically ``plan_spmv(mat, dtype=jnp.bfloat16)``); defaults to
    ``A`` itself, which degenerates to restarted CG.  ``inner_iters``
    CG steps run per cycle (branch-free); up to ``maxiter`` cycles run
    until the TRUE residual satisfies ``||b - A x|| <= tol * ||b||``.

    ``precond`` (optional) preconditions the INNER CG; it acts in the
    original vector space, so supplying one disables the shared
    padded-space fast path.  Matvec-closure ``A`` needs ``n=``.

    Returns ``run(b, x0=None) -> IRResult``; repeated same-shape calls
    hit the jit cache.  A must be SPD (inner CG requirement).
    """
    if inner_iters < 1 or maxiter < 1:
        raise ValueError("inner_iters and maxiter must be >= 1, got "
                         f"{inner_iters}, {maxiter}")
    if low is None:
        low = A
    if n is None and hasattr(A, "shape"):
        n = A.shape[0]
    if n is None:                         # SpmvPlan: logical shape lives
        mtx = getattr(A, "matrix", None)  # on the packed matrix
        if mtx is not None and hasattr(mtx, "shape"):
            n = mtx.shape[0]
    if n is None:
        raise ValueError("ir_runner needs n= for matvec closures")
    if precond is None:
        enc, dec, mv_hi, mv_lo = _paired_spaces(A, low, n)
        M = lambda r: r
    else:
        enc = dec = lambda v: v
        mv_hi, mv_lo = _as_matvec(A), _as_matvec(low)
        M = precond

    def inner_cg(r):
        # fixed-k CG on the low operator, x0 = 0: d ~= A_lo^{-1} r.
        # vectors stay in r.dtype (f32); only the MATRIX DATA is low
        # precision — the kernels promote accumulation to the x dtype.
        z0 = M(r)
        rz0 = jnp.vdot(r, z0)

        def body(_, state):
            d, rr, p, rz = state
            Ap = mv_lo(p)
            pAp = jnp.vdot(p, Ap)
            alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
            d = d + alpha * p
            rr = rr - alpha * Ap
            z = M(rr)
            rz_new = jnp.vdot(rr, z)
            p = z + (rz_new / jnp.where(rz == 0, 1.0, rz)) * p
            return (d, rr, p, rz_new)

        d, _, _, _ = lax.fori_loop(
            0, inner_iters, body, (jnp.zeros_like(r), r, z0, rz0))
        return d

    @jax.jit
    def run_jit(b, x0):
        bnorm = jnp.sqrt(jnp.vdot(b, b))
        limit = tol * jnp.maximum(bnorm, 1e-300)
        r0 = b - mv_hi(x0)

        def cond(state):
            x, r, it, prev, bad = state
            rn = jnp.sqrt(jnp.vdot(r, r))
            # stagnation exit: once refinement hits the working-precision
            # rounding floor the residual stops contracting, so stop
            # instead of burning the remaining maxiter cycles.  CG's
            # residual 2-NORM is not monotone (it minimizes the A-norm
            # of the error), so a single flat cycle is normal on
            # ill-conditioned operators with smooth right-hand sides —
            # require THREE consecutive non-improving cycles.
            return (rn > limit) & (it < maxiter) & (bad < 3)

        def body(state):
            x, r, it, prev, bad = state
            rn = jnp.sqrt(jnp.vdot(r, r))
            bad = jnp.where(rn < 0.9 * prev, 0, bad + 1)
            x = x + inner_cg(r)
            return (x, b - mv_hi(x), it + 1, rn, bad)

        rn0_dtype = jnp.sqrt(jnp.vdot(r0, r0)).dtype
        x, r, it, _, _ = lax.while_loop(
            cond, body, (x0, r0, 0, jnp.full((), jnp.inf, rn0_dtype), 0))
        rnorm = jnp.sqrt(jnp.vdot(r, r))
        return x, it, rnorm, rnorm <= limit

    def run(b, x0=None) -> IRResult:
        b = enc(jnp.asarray(b))
        x0 = jnp.zeros_like(b) if x0 is None else enc(jnp.asarray(x0))
        x, it, rnorm, ok = run_jit(b, x0)
        return IRResult(x=dec(x), outer_iterations=it,
                        residual_norm=rnorm, converged=ok)

    return run


def ir_solve(A, b, *, low=None, inner_iters: int = 16, maxiter: int = 40,
             tol: float = 1e-7, x0=None,
             precond: Callable | None = None) -> IRResult:
    """One-shot mixed-precision refinement solve (see :func:`ir_runner`)."""
    b = jnp.asarray(b)
    run = ir_runner(A, low=low, inner_iters=inner_iters, maxiter=maxiter,
                    tol=tol, precond=precond, n=b.shape[0])
    return run(b, x0)
