#!/usr/bin/env python
"""Streaming-DIA SpMM tile-size probe: the 4096-grid Poisson band needs
h = 4096 halo slivers, so at rb = 4096 the X panels are fetched 3x.
Fatter row tiles amortize the halo (X traffic 1 + 2h/rb) at the price of
VMEM; find the measured optimum for the bench's 32-RHS config."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_spmv.bench.harness import time_chained
from tpu_spmv.kernels import dia_stream

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench import build_poisson_dia_device, GRID


def log(*a):
    print(*a, flush=True)


def main():
    NRHS = 32
    A = build_poisson_dia_device(GRID, jnp.float32)
    scale = np.float32(1.0 / 8.0)
    for rb in (32768, 65536, 131072):
        try:
            S = dia_stream.pack_sdia(A, rb=rb)
            Xt = jax.random.uniform(jax.random.PRNGKey(7), (NRHS, S.npad),
                                    jnp.float32)
            Xt = Xt.at[:, :S.L].set(0).at[:, S.L + A.shape[0]:].set(0)
            y0 = dia_stream.spmv_sdia_padded(S, Xt[0])
            Yt = dia_stream.spmm_sdia_padded_t(S, Xt)
            rel = float(jnp.max(jnp.abs(Yt[0] - y0)) / jnp.max(jnp.abs(y0)))
            assert rel < 2e-5, rel
            dt = time_chained(
                lambda C, Ad: dia_stream.spmm_sdia_padded_t(Ad, C) * scale,
                Xt, iters=30, warm=3, operands=(S,))
            gb = (A.data.size + 4 * NRHS * S.npad
                  + 2 * NRHS * (S.npad // rb) * dia_stream._halo_size(
                      S.offsets, rb)) * 0  # traffic model omitted
            log(f"rb={rb:6d}: {dt * 1e3:7.2f} ms | "
                f"{2 * A.nnz * NRHS / dt / 1e12:5.2f} TFLOP-equiv/s | "
                f"{(A.data.size + 2 * NRHS * S.npad) * 4 / dt / 1e9:5.0f} "
                f"GB/s min-traffic")
        except Exception as e:
            log(f"rb={rb:6d}: FAILED {type(e).__name__}: {str(e)[:140]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
