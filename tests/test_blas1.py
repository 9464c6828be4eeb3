"""BLAS-1 / vector-op parity (reference `/root/reference/src/vec_vec.cpp`
and `/root/reference/src/vector.cpp`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_spmv.ops import blas1


@pytest.fixture
def xy(rng):
    return (jnp.asarray(rng.standard_normal(100)),
            jnp.asarray(rng.standard_normal(100)))


def test_dot(xy):
    x, y = xy
    np.testing.assert_allclose(
        float(blas1.dot(x, y)), float(np.dot(np.asarray(x), np.asarray(y))),
        rtol=1e-12,
    )


@pytest.mark.parametrize("alpha,beta", [
    (0.0, 1.0), (1.0, 0.0), (1.0, 1.0), (-1.0, 1.0), (1.0, -1.0),
    (2.5, -0.75),
])
def test_axpby_special_cases(xy, alpha, beta):
    """The reference special-cases α/β ∈ {0, ±1}
    (`/root/reference/src/vec_vec.cpp:24-94`); same results here for all."""
    x, y = xy
    np.testing.assert_allclose(
        np.asarray(blas1.axpby(alpha, x, beta, y)),
        alpha * np.asarray(x) + beta * np.asarray(y),
        rtol=1e-14,
    )


def test_axpy_add2scaled(xy, rng):
    x, y = xy
    z = jnp.asarray(rng.standard_normal(100))
    np.testing.assert_allclose(
        np.asarray(blas1.axpy(3.0, x, y)), np.asarray(y) + 3 * np.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(blas1.add2scaled(y, 2.0, x, -1.0, z)),
        np.asarray(y) + 2 * np.asarray(x) - np.asarray(z),
    )


def test_fill_scale_shift():
    v = blas1.fill(5, 3.25)
    np.testing.assert_allclose(np.asarray(v), 3.25)
    np.testing.assert_allclose(np.asarray(blas1.scale(v, 2.0)), 6.5)
    np.testing.assert_allclose(np.asarray(blas1.shift(v, -1.0)), 2.25)


def test_fill_random_reproducible():
    key = jax.random.key(7)
    a = blas1.fill_random(key, 50)
    b = blas1.fill_random(key, 50)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.all((np.asarray(a) >= 0) & (np.asarray(a) < 1))


def test_check_vector_tolerance():
    """Reference ``checkVector``: abs tol 1e-6
    (`/root/reference/src/vector.cpp:161-171`)."""
    x = jnp.zeros(4)
    assert blas1.check_vector(x, x + 5e-7)
    assert not blas1.check_vector(x, x + 5e-6)


def test_allclose_gate():
    x = jnp.asarray(np.array([1.0, 2.0]))
    assert blas1.allclose(x, x * (1 + 1e-12))
    assert not blas1.allclose(x, x * (1 + 1e-8))


def test_norm2(xy):
    x, _ = xy
    np.testing.assert_allclose(
        float(blas1.norm2(x)), np.linalg.norm(np.asarray(x)), rtol=1e-12
    )
