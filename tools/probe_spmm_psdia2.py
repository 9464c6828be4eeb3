"""Probe 2: PSDIA 32-RHS SpMM tile-size / VMEM-budget sweep on chip.

probe_spmm_psdia measured 13.53 ms (317 GB/s of 605) at rb=65536 — far
below the SpMV kernel's 528 GB/s.  Candidates: fatter tiles (SpMV's
optimum is rb=131072; the nrhs panel cap currently pins SpMM to 65536)
and the scoped-VMEM budget that decides whether in/out DMA double-buffers.

Run standalone (owns the chip): python tools/probe_spmm_psdia2.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import build_poisson_dia_device
from tpu_spmv.bench.harness import time_chained
from tpu_spmv.kernels import dia_stream

GRID = 4096
NRHS = 32


def main():
    dtype = jnp.float32
    A_dia = build_poisson_dia_device(GRID, dtype)
    n = GRID * GRID
    scale = jnp.asarray(1.0 / 8.0, dtype)
    nnz = A_dia.nnz

    for rb, vmem_mb in [(65536, 64), (65536, 100), (131072, 100),
                        (32768, 64)]:
        try:
            P32 = dia_stream.pack_psdia(A_dia, period=GRID, rb=rb)
        except ValueError as e:
            print(f"rb={rb}: pack refused ({e})", flush=True)
            continue
        Xt = jax.random.uniform(jax.random.PRNGKey(7), (NRHS, P32.npad),
                                dtype)
        Xt = Xt.at[:, :P32.L].set(0).at[:, P32.L + n:].set(0)
        dia_stream._SPMM_VMEM_MB = vmem_mb   # probe hook
        jax.clear_caches()    # budget is read at trace time — force retrace
        try:
            dt = time_chained(
                lambda C, Ad: dia_stream.spmm_psdia_padded_t(Ad, C) * scale,
                Xt, iters=40, warm=4, operands=(P32,))
        except Exception as e:  # noqa: BLE001 — probe reports and continues
            print(f"rb={rb} vmem={vmem_mb}MB: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        gbps = (2 * 4 * NRHS * n) / dt / 1e9
        print(f"rb={rb:6d} vmem={vmem_mb:3d}MB: {dt * 1e3:7.3f} ms "
              f"({2 * nnz * NRHS / dt / 1e9:4.0f} GFLOP/s, "
              f"{gbps:4.0f} GB/s x+y)", flush=True)


if __name__ == "__main__":
    main()
