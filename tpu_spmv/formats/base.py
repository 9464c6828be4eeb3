"""Shared infrastructure for sparse-format pytree dataclasses.

The reference (arm-spmv) models each format as a heap-owning C++ class with
conversion constructors (``/root/reference/include/matrix.h:7-138``).  The
TPU-native design instead models each format as an **immutable pytree
dataclass** of ``jax.Array`` leaves plus static (hashable) metadata — so a
matrix can flow through ``jit`` / ``shard_map`` / ``pjit`` boundaries like any
other JAX value, and shape metadata participates in trace-time specialization
rather than runtime branching.

Conventions shared by all formats:

- ``shape = (nrow, ncol)`` is static Python metadata (part of the jit cache
  key), never a traced value — XLA requires static shapes.
- Index arrays are ``int32`` (TPU-native integer width; the VPU has no
  efficient int64 path) and value arrays default to ``float32`` with
  ``float64`` supported when ``jax.config.jax_enable_x64`` is on (the
  reference is double-precision everywhere; see BASELINE.md's 1e-10 gate).
- ``nnz`` (and any padded capacity) is static: it is the length of the value
  array, fixed at trace time.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "INDEX_DTYPE",
    "static_field",
    "sparse_dataclass",
    "default_real_dtype",
    "as_index_array",
    "as_value_array",
]

#: TPU-native index dtype.  The reference uses C ``int`` (32-bit) throughout
#: (`/root/reference/include/matrix.h:9-24`); int32 is also what the TPU VPU
#: handles natively.
INDEX_DTYPE = jnp.int32


def static_field(**kwargs: Any) -> dataclasses.Field:
    """A dataclass field treated as static (hashable) pytree metadata."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def sparse_dataclass(cls):
    """Register ``cls`` as a frozen dataclass and a JAX pytree.

    Fields marked with :func:`static_field` become aux metadata; all other
    fields are traced array leaves.
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    return jax.tree_util.register_dataclass(cls)


def default_real_dtype() -> jnp.dtype:
    """float64 when x64 mode is enabled, else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def as_index_array(x) -> jax.Array:
    """Coerce host data to an int32 device array.

    The dtype cast happens ON HOST: ``jnp.asarray(arr, dtype=...)`` with
    a mismatched dtype lowers an eager ``convert_element_type`` — one
    remote XLA compile (~0.45 s through the tunnel) PER SHAPE, measured
    as the dominant pack cold-start cost (round 5).  A pre-cast numpy
    array makes it a pure device_put."""
    return jnp.asarray(np.asarray(x, dtype=np.dtype(INDEX_DTYPE)))


def as_value_array(x, dtype=None) -> jax.Array:
    """Coerce host data to a real-valued device array.

    Without an explicit dtype, float inputs keep at most
    :func:`default_real_dtype` precision.
    """
    arr = np.asarray(x)
    if dtype is None:
        dtype = default_real_dtype()
    # cast on host (ml_dtypes covers bf16): a device-side cast would
    # eager-compile convert_element_type per shape (see as_index_array)
    return jnp.asarray(arr.astype(np.dtype(dtype), copy=False))
