"""Lanczos tridiagonalization + extremal eigenvalues for symmetric A.

Completes the eigensolver surface next to
:func:`~tpu_spmv.solvers.power_iteration`: where power iteration gives
only the dominant eigenvalue at a convergence rate of ``|λ2/λ1|^k``,
``k`` Lanczos steps give BOTH ends of the spectrum (the inputs
:func:`~tpu_spmv.solvers.chebyshev` and
:func:`~tpu_spmv.solvers.chebyshev_preconditioner` need) with the
square-root-of-condition-number convergence of a Krylov method.

TPU shape: the whole k-step recurrence is ONE ``lax.scan`` — per step a
single SpMV plus two dots and two axpys, no host sync — producing the
tridiagonal coefficients ``(alphas, betas)`` as length-k arrays.  The
k x k tridiagonal eigenproblem is dispatched to
``jnp.linalg.eigh_tridiagonal``-style host/LAPACK work OUTSIDE the hot
loop (k is 30-100: microscopic next to one SpMV at any interesting n).

Orthogonality: plain Lanczos loses it once Ritz pairs converge (finite
precision).  ``full_reorth=True`` re-orthogonalizes each new vector
against ALL previous ones (stored ``[k, n]``) — an O(k·n) axpy sweep per
step, the standard robust variant and still reduction-light; off by
default for the memory-constrained case.  Eigenvalue ESTIMATES at the
spectrum's ends are accurate long before full orthogonality matters,
which is the preconditioner-window use case.

No reference-code counterpart (public algorithm — Golub & Van Loan
§10.1); the reference's solver surface stops at unused BLAS-1
(`/root/reference/src/vec_vec.cpp`).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .cg import _as_matvec

__all__ = ["LanczosResult", "lanczos", "eigsh_lanczos"]


class LanczosResult(NamedTuple):
    alphas: jax.Array       # [k] tridiagonal diagonal
    betas: jax.Array        # [k-1] tridiagonal off-diagonal
    V: jax.Array | None     # [k, n] Lanczos basis (full_reorth only)


def lanczos(A, *, k: int = 50, v0=None, key=None, n: int | None = None,
            full_reorth: bool = False) -> LanczosResult:
    """Run ``k`` Lanczos steps on symmetric ``A`` (format or matvec).

    Returns the tridiagonal coefficients; the basis ``V`` only when
    ``full_reorth=True`` (it must be stored for the re-orthogonalization
    anyway).  Early breakdown (invariant subspace found: ``beta ~ 0``)
    continues the scan with a zero vector to keep the shape static; the
    steps past the breakdown carry ``alpha = 0`` and MUST be truncated
    before eigensolving the tridiagonal (a zero row would inject a
    spurious eigenvalue 0) — :func:`eigsh_lanczos` does this; direct
    consumers of :class:`LanczosResult` should cut at the first
    ``beta <= ~1e-12`` themselves.
    """
    matvec = _as_matvec(A)
    n = A.shape[0] if hasattr(A, "shape") else n
    if n is None:
        raise ValueError("lanczos needs n= for matvec closures")
    if k < 1:
        raise ValueError("k must be >= 1")
    if v0 is None:
        if key is None:
            key = jax.random.key(0)
        v0 = jax.random.uniform(key, (n,)) - 0.5
    v0 = jnp.asarray(v0)
    dtype = v0.dtype
    eps = jnp.asarray(1e-30, dtype)

    v1 = v0 / jnp.maximum(jnp.sqrt(jnp.vdot(v0, v0)), eps)

    if full_reorth:
        @jax.jit
        def run(v1):
            V0 = jnp.zeros((k, n), dtype).at[0].set(v1)

            def body(carry, i):
                V, v_prev, v, beta_prev = carry
                w = matvec(v)
                alpha = jnp.vdot(v, w)
                w = w - alpha * v - beta_prev * v_prev
                # re-orthogonalize against the whole stored basis (rows
                # past i are zero, so the masked dot is a no-op there)
                w = w - V.T @ (V @ w)
                beta = jnp.sqrt(jnp.maximum(jnp.vdot(w, w), 0.0))
                v_next = jnp.where(beta > 1e-12,
                                   w / jnp.maximum(beta, eps),
                                   jnp.zeros_like(w))
                V = lax.cond(i + 1 < k,
                             lambda V: V.at[i + 1].set(v_next),
                             lambda V: V, V)
                return (V, v, v_next, beta), (alpha, beta)

            (V, _, _, _), (alphas, betas) = lax.scan(
                body, (V0, jnp.zeros_like(v1), v1, jnp.zeros((), dtype)),
                jnp.arange(k))
            return alphas, betas[:-1], V

        alphas, betas, V = run(v1)
        return LanczosResult(alphas=alphas, betas=betas, V=V)

    @jax.jit
    def run(v1):
        def body(carry, _):
            v_prev, v, beta_prev = carry
            w = matvec(v)
            alpha = jnp.vdot(v, w)
            w = w - alpha * v - beta_prev * v_prev
            beta = jnp.sqrt(jnp.maximum(jnp.vdot(w, w), 0.0))
            v_next = jnp.where(beta > 1e-12,
                               w / jnp.maximum(beta, eps),
                               jnp.zeros_like(w))
            return (v, v_next, beta), (alpha, beta)

        _, (alphas, betas) = lax.scan(
            body, (jnp.zeros_like(v1), v1, jnp.zeros((), dtype)), None,
            length=k)
        return alphas, betas[:-1]

    alphas, betas = run(v1)
    return LanczosResult(alphas=alphas, betas=betas, V=None)


def eigsh_lanczos(A, *, k: int = 50, which: str = "both", v0=None,
                  key=None, n: int | None = None,
                  full_reorth: bool = True):
    """Extremal eigenvalue estimates of symmetric ``A`` from ``k``
    Lanczos steps.

    ``which``: ``"both"`` -> ``(lmin, lmax)``, ``"LM"`` -> ``lmax``,
    ``"SM"`` -> ``lmin`` (scipy.sparse.linalg.eigsh naming).  The k x k
    tridiagonal eigenproblem runs on host numpy (k is tiny).  The
    returned floats feed :func:`~tpu_spmv.solvers.chebyshev` /
    :func:`~tpu_spmv.solvers.chebyshev_preconditioner` directly.
    """
    res = lanczos(A, k=k, v0=v0, key=key, n=n, full_reorth=full_reorth)
    a = np.asarray(res.alphas, dtype=np.float64)
    b = np.asarray(res.betas, dtype=np.float64)
    # truncate at exact breakdown (invariant subspace): steps past a
    # ~zero beta carry alpha = 0 and would inject a spurious eigenvalue
    # 0 into an SPD spectrum (e.g. lanczos(diag(2,3,4), v0=e1) breaks
    # down at step 1 with T = diag(2, 0, 0, ...))
    brk = np.flatnonzero(np.abs(b) <= 1e-12)
    if len(brk):
        cut = int(brk[0]) + 1
        a, b = a[:cut], b[:cut - 1]
    T = np.diag(a) + np.diag(b, 1) + np.diag(b, -1)
    w = np.linalg.eigvalsh(T)
    if which == "LM":
        return float(w[-1])
    if which == "SM":
        return float(w[0])
    if which == "both":
        return float(w[0]), float(w[-1])
    raise ValueError(f"which must be 'both'|'LM'|'SM', got {which!r}")
