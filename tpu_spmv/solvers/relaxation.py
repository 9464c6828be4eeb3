"""Multicolor Gauss–Seidel / SOR / SymGS — the relaxation smoothers the
reference declared and never shipped.

The reference extracts a ``diagonal[]`` "for SymGS"
(`/root/reference/include/matrix.h:36`, filled at
`/root/reference/src/matrix.cpp:146-153`) that nothing ever uses.  A
textbook Gauss–Seidel sweep is a sequential triangular recurrence — one
row at a time, unusable on a vector machine.  The TPU-native form is
**multicolor** GS: partition the rows into colors such that no two rows
of one color are coupled (``A[i, j] = 0`` whenever ``color[i] ==
color[j]``, ``i != j``); then all rows of a color update SIMULTANEOUSLY,
and a sweep is ``ncolors`` full SpMVs + masked pointwise updates — every
one a wide vector op.  The update order "color 0, 1, 2, ..." is exactly
classical GS under the color-sorted row permutation, so convergence
theory carries over (and the result is deterministic, unlike the
reference's OpenMP-atomic scatter kernels).

For a color ``c``, using that same-color off-diagonals are zero::

    (A x)_c = A_{c, not-c} x_{not-c} + d_c * x_c
    x_c    <- (1 - omega) x_c + omega * D_c^{-1} (b_c - (A x)_c + d_c x_c)

i.e. one FULL SpMV per color (the planner's fast kernel — no row-subset
kernels needed) and a ``jnp.where`` update keyed on a device-resident
``int32`` color vector (never materialized as dense per-color masks —
power-law patterns color into the hundreds, which would make a
``[ncolors, n]`` mask array multi-GB).  Grid stencils (5-point Poisson)
2-color (red-black); general matrices get a greedy coloring of the
symmetrized pattern in ``native/permute_router.cpp:greedy_color``
(O(nnz) C++; the per-row Python loop it replaces took minutes at bench
scale), with a pure-Python fallback when the .so is not built.

Cost per forward sweep: ``ncolors`` SpMVs.  SymGS (forward + backward)
is ``2 * ncolors``, so high-color patterns are better served by
:func:`~tpu_spmv.solvers.chebyshev` (k SpMVs for a degree-k smoother
regardless of structure); multicolor GS is the standard multigrid
smoother and the reference's named intent, so both live here.

No reference-code counterpart to copy (the algorithms are public:
Saad §12.4 multicoloring; Golub & Van Loan §11.2 SOR).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .cg import _as_matvec, safe_dinv

__all__ = ["multicolor", "gauss_seidel_sweep", "sor", "SORResult",
           "symgs_preconditioner"]


def _greedy_color_py(indptr, indices, n) -> np.ndarray:
    """Pure-Python fallback for :func:`multicolor` (native .so absent)."""
    color = np.full(n, -1, dtype=np.int32)
    for i in range(n):
        nb = indices[indptr[i]:indptr[i + 1]]
        used = set(color[j] for j in nb if color[j] >= 0)
        c = 0
        while c in used:
            c += 1
        color[i] = c
    return color


def multicolor(host_mat) -> np.ndarray:
    """Greedy multicoloring of a scipy sparse matrix's SYMMETRIZED
    pattern: returns ``color[i] in [0, ncolors)`` with no edge inside a
    color.  Grid stencils come out 2-colored (red-black); general sparse
    patterns get at most (max symmetrized degree + 1) colors.  Host-side,
    runs once per matrix; O(nnz) in C++
    (``native/permute_router.cpp:greedy_color``)."""
    import ctypes

    import scipy.sparse as sp

    from ..kernels.permute import _native_router

    A = sp.csr_matrix(host_mat)
    n = A.shape[0]
    if A.shape[0] != A.shape[1]:
        raise ValueError("multicolor needs a square matrix")
    S = (A + A.T).tocsr()          # symmetrize: GS couples both ways
    S.sort_indices()
    indptr = np.ascontiguousarray(S.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(S.indices, dtype=np.int32)
    lib = _native_router()
    if lib is not None and hasattr(lib, "greedy_color"):
        if not getattr(lib, "_gc_sig", False):
            I32 = ctypes.POINTER(ctypes.c_int32)
            I64 = ctypes.POINTER(ctypes.c_int64)
            lib.greedy_color.restype = ctypes.c_int32
            lib.greedy_color.argtypes = [I64, I32, ctypes.c_int64, I32]
            lib._gc_sig = True
        color = np.full(n, -1, dtype=np.int32)
        lib.greedy_color(indptr.ctypes.data_as(
                             ctypes.POINTER(ctypes.c_int64)),
                         indices.ctypes.data_as(
                             ctypes.POINTER(ctypes.c_int32)),
                         n, color.ctypes.data_as(
                             ctypes.POINTER(ctypes.c_int32)))
        return color
    return _greedy_color_py(indptr, indices, n)


def gauss_seidel_sweep(A, b, x, *, color: jax.Array, ncolors: int,
                       dinv: jax.Array, omega: float = 1.0,
                       symmetric: bool = False) -> jax.Array:
    """One multicolor Gauss–Seidel (``omega=1``) / SOR sweep.

    ``color`` is the device-resident int32 vector from
    :func:`multicolor` (``ncolors`` static), ``dinv`` the inverse
    diagonal.  ``symmetric=True`` appends the reverse-order half
    (SymGS).  ``A`` may be a format instance or a matvec closure — each
    color costs one full SpMV (same-color couplings are zero by
    construction, so the full ``A x`` restricted to the color equals its
    off-color row sums plus ``d_c x_c``)."""
    matvec = _as_matvec(A)
    om = jnp.asarray(omega, x.dtype)

    def half(x, order):
        for c in order:
            ax = matvec(x)
            # b - A_{c,~c} x_{~c}  ==  b - (A x - d * x)  on color rows
            gs = dinv * (b - ax) + x
            x = jnp.where(color == c, x + om * (gs - x), x)
        return x

    x = half(x, range(ncolors))
    if symmetric:
        x = half(x, range(ncolors - 1, -1, -1))
    return x


class SORResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array
    residual_norm: jax.Array
    converged: jax.Array


def sor(A, b, *, host_mat=None, color=None, dinv=None, omega: float = 1.0,
        x0=None, tol: float = 1e-8, maxiter: int = 500,
        symmetric: bool = False) -> SORResult:
    """Multicolor SOR (``omega=1`` → Gauss–Seidel) solve of ``A x = b``.

    Needs the host scipy matrix for the one-time coloring + diagonal, or
    precomputed ``color`` AND ``dinv`` arrays.  The whole iteration is
    one ``lax.while_loop``; each sweep costs ``ncolors`` SpMVs
    (``2 x`` with ``symmetric=True``).
    """
    if (color is None or dinv is None) and host_mat is None:
        raise ValueError("sor needs host_mat= (for coloring + diagonal) "
                         "or BOTH color= and dinv=")
    if color is None:
        color = multicolor(host_mat)
    color = np.asarray(color)
    ncolors = int(color.max()) + 1 if len(color) else 1
    b = jnp.asarray(b)
    color_dev = jnp.asarray(color, jnp.int32)
    if dinv is None:
        dinv = safe_dinv(np.asarray(host_mat.diagonal(), np.float64),
                         b.dtype)
    else:
        dinv = jnp.asarray(dinv, b.dtype)
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    matvec = _as_matvec(A)

    @jax.jit
    def run(b, x0, color_dev, dinv):
        limit = tol * jnp.maximum(jnp.sqrt(jnp.vdot(b, b)), 1e-300)

        def cond(st):
            x, it, rn = st
            return (rn > limit) & (it < maxiter)

        def body(st):
            x, it, _ = st
            x = gauss_seidel_sweep(A, b, x, color=color_dev,
                                   ncolors=ncolors, dinv=dinv,
                                   omega=omega, symmetric=symmetric)
            r = b - matvec(x)
            return (x, it + 1, jnp.sqrt(jnp.vdot(r, r)))

        r0 = b - matvec(x0)
        x, it, rn = lax.while_loop(
            cond, body, (x0, jnp.int32(0), jnp.sqrt(jnp.vdot(r0, r0))))
        return x, it, rn, rn <= limit

    x, it, rn, ok = run(b, x0, color_dev, dinv)
    return SORResult(x=x, iterations=it, residual_norm=rn, converged=ok)


def symgs_preconditioner(A, host_mat, *, sweeps: int = 1,
                         omega: float = 1.0) -> Callable:
    """SymGS as a CG preconditioner: ``z ≈ M⁻¹ r`` by ``sweeps``
    symmetric multicolor sweeps from ``z = 0``.

    Symmetric sweeps keep the preconditioner SPD for SPD ``A`` (forward
    only would break CG).  This is THE standard multigrid smoother and
    the role the reference's unused ``diagonal[]`` was declared for.
    Cost: ``2 * ncolors * sweeps`` SpMVs per application — on reduction-
    bound meshes prefer :func:`~tpu_spmv.solvers.chebyshev_preconditioner`
    (zero extra dots either way, but fewer SpMVs per unit of smoothing).
    """
    color = multicolor(host_mat)
    ncolors = int(color.max()) + 1 if len(color) else 1
    color_dev = jnp.asarray(color, jnp.int32)
    # safe inverse computed on HOST numpy at build time (the traced
    # form cached in the closure leaked a tracer across jits — see
    # safe_dinv_host's docstring)
    from .cg import safe_dinv_host

    dinv_host = safe_dinv_host(host_mat.diagonal())

    def apply(r):
        dinv = jnp.asarray(dinv_host, r.dtype)
        z = jnp.zeros_like(r)
        for _ in range(sweeps):
            z = gauss_seidel_sweep(A, r, z, color=color_dev,
                                   ncolors=ncolors, dinv=dinv,
                                   omega=omega, symmetric=True)
        return z

    return apply
