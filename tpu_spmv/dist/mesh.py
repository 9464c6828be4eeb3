"""Mesh construction and multi-host initialization.

Reference parity: topology discovery — ``numa_num_configured_nodes()`` and
node assignment ``i % numanodes`` (`/root/reference/src/mat_vec.cpp:232,254`)
— becomes ``jax.devices()`` + a 1-D ``jax.sharding.Mesh``; thread pinning
(``numa_run_on_node``) is implicit in SPMD placement.

Multi-host: the reference is single-process; the TPU framework scales across
hosts with ``jax.distributed.initialize`` + a global mesh whose leading axis
spans all chips in the pod slice (collectives ride ICI inside a slice, DCN
across slices).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "init_multihost", "device_count"]


def device_count() -> int:
    return len(jax.devices())


def make_mesh(ndev: int | None = None, axis: str = "x") -> Mesh:
    """1-D mesh over the first ``ndev`` devices (default: all).

    For tests, run under ``XLA_FLAGS=--xla_force_host_platform_device_count=N``
    on CPU to get an N-device virtual mesh (SURVEY.md §4).
    """
    devices = jax.devices()
    if ndev is None:
        ndev = len(devices)
    if ndev > len(devices):
        raise ValueError(f"requested {ndev} devices, only {len(devices)} available")
    return Mesh(np.asarray(devices[:ndev]), (axis,))


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Initialize JAX's multi-host runtime (no-op if already initialized).

    On Cloud TPU pods the arguments are auto-detected from the environment;
    pass them explicitly elsewhere.  After this, ``jax.devices()`` spans the
    full pod slice and :func:`make_mesh` builds a global mesh.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # already initialized (or single-process context) — keep going
        pass
