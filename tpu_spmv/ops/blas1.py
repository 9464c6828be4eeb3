"""BLAS-1 / dense-vector operations.

Reference parity: ``vec_dot`` / ``vec_axpby`` (`/root/reference/src/vec_vec.cpp`)
and the ``Vector`` method surface (`/root/reference/include/vector.h:19-25`,
`/root/reference/src/vector.cpp`): Fill, FillRandom, Copy, Scale, Shift,
AddScaled (axpy), Add2Scaled (axpby2) and ``checkVector``.

On TPU these are all single fused XLA expressions; the reference's α/β ∈
{0, ±1} special-case ladder (`/root/reference/src/vec_vec.cpp:24-94`) is left
to the compiler, which constant-folds scalar literals under ``jit``.
Functional style: every op returns a new array (JAX arrays are immutable),
mirroring the in-place C++ methods capability-for-capability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "dot", "axpby", "axpy", "add2scaled", "fill", "fill_random",
    "scale", "shift", "norm2", "check_vector", "allclose",
]


def dot(x: jax.Array, y: jax.Array) -> jax.Array:
    """⟨x, y⟩ (reference ``vec_dot``, `/root/reference/src/vec_vec.cpp:15-22`)."""
    return jnp.dot(x, y)


def axpby(alpha, x: jax.Array, beta, y: jax.Array) -> jax.Array:
    """``alpha*x + beta*y`` (reference ``vec_axpby``,
    `/root/reference/src/vec_vec.cpp:24-94`)."""
    return alpha * x + beta * y


def axpy(alpha, x: jax.Array, y: jax.Array) -> jax.Array:
    """``y + alpha*x`` (reference ``Vector::AddScaled``,
    `/root/reference/src/vector.cpp:101-112`)."""
    return y + alpha * x


def add2scaled(y: jax.Array, alpha, x1: jax.Array, beta, x2: jax.Array) -> jax.Array:
    """``y + alpha*x1 + beta*x2`` (reference ``Vector::Add2Scaled``,
    `/root/reference/src/vector.cpp:114-128`)."""
    return y + alpha * x1 + beta * x2


def fill(n: int, value, dtype=None) -> jax.Array:
    """Constant vector (reference ``Vector::Fill``,
    `/root/reference/src/vector.cpp:40-49`)."""
    return jnp.full((n,), value, dtype=dtype)


def fill_random(key: jax.Array, n: int, dtype=None) -> jax.Array:
    """Uniform [0, 1) vector (reference ``Vector::FillRandom`` uses
    ``rand()/RAND_MAX``, `/root/reference/src/vector.cpp:51-69`; here a
    counter-based JAX PRNG so results are reproducible and parallelizable)."""
    return jax.random.uniform(key, (n,), dtype=dtype or jnp.float32)


def scale(x: jax.Array, alpha) -> jax.Array:
    """``alpha * x`` (reference ``Vector::Scale``,
    `/root/reference/src/vector.cpp:81-90`)."""
    return alpha * x


def shift(x: jax.Array, alpha) -> jax.Array:
    """``x + alpha`` (reference ``Vector::Shift``,
    `/root/reference/src/vector.cpp:92-99`)."""
    return x + alpha


def norm2(x: jax.Array) -> jax.Array:
    """Euclidean norm (solver-support helper; no direct reference analog)."""
    return jnp.sqrt(jnp.dot(x, x))


def check_vector(x, y, tol: float = 1e-6) -> bool:
    """Elementwise absolute-tolerance compare (reference ``checkVector``,
    `/root/reference/src/vector.cpp:161-171`, abs tol 1e-6 — present there
    but never invoked by the driver, SURVEY.md Q1; here it is actually used
    by the bench harness)."""
    return bool(jnp.all(jnp.abs(jnp.asarray(x) - jnp.asarray(y)) <= tol))


def allclose(x, y, rtol: float = 1e-10, atol: float = 0.0) -> bool:
    """Relative-tolerance compare for the BASELINE 1e-10 parity gate."""
    return bool(jnp.allclose(jnp.asarray(x), jnp.asarray(y), rtol=rtol, atol=atol))
