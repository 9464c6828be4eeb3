"""Test configuration: run JAX on CPU with 8 virtual devices.

The sitecustomize in this image registers the 'axon' TPU platform for every
interpreter; tests must run on CPU (fast compiles, float64 oracle, virtual
multi-device mesh), so we force the platform via jax.config *before* any
backend is initialized, and request 8 host devices — the JAX idiom for
testing mesh/collective code without real hardware (SURVEY.md §4).
"""

import os

# Must be set before the CPU backend initializes (first jax.devices() call).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# float64 for oracle parity (the reference is double-precision; BASELINE
# demands <=1e-10 relative error against float64 semantics).
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
