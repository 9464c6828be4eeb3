"""Probe: headline-scale 32-RHS SpMM — SDIA (streamed data) vs PSDIA
(VMEM-resident periodic pattern) on the real chip.

SpMV already routes the 4096-grid Poisson through PSDIA (0.254 ms,
~87% of measured peak); the SpMM bench still streams SDIA data
(14.26 ms = ~54% of peak).  Traffic models at nrhs=32 (f32, 16.7M rows):
  SDIA : data 0.335 GB + 32*(x+y) 4.29 GB = 4.63 GB  -> 7.65 ms @ 605 GB/s
  PSDIA:                 32*(x+y)         = 4.29 GB  -> 7.09 ms @ 605 GB/s
so the traffic delta is small — the probe answers whether the PSDIA SpMM
kernel (no streamed block competing for VMEM bandwidth, fatter rb) closes
the 54% -> 85% efficiency gap the SpMV comparison suggests.

Run standalone (owns the chip): python tools/probe_spmm_psdia.py [grid]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import build_poisson_dia_device
from tpu_spmv.bench.harness import time_chained
from tpu_spmv.kernels import dia_stream

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
NRHS = 32


def main():
    dtype = jnp.float32
    A_dia = build_poisson_dia_device(GRID, dtype)
    n = GRID * GRID
    inf_norm = 8.0
    scale = jnp.asarray(1.0 / inf_norm, dtype)

    S32 = dia_stream.pack_sdia(A_dia, nrhs=NRHS)
    P32 = dia_stream.pack_psdia(A_dia, period=GRID, nrhs=NRHS)
    print(f"grid={GRID} n={n} sdia rb={S32.rb} psdia rb={P32.rb} "
          f"npad s={S32.npad} p={P32.npad}", flush=True)

    key = jax.random.PRNGKey(7)
    Xt_s = jax.random.uniform(key, (NRHS, S32.npad), dtype)
    Xt_s = Xt_s.at[:, :S32.L].set(0).at[:, S32.L + n:].set(0)
    Xt_p = jax.random.uniform(key, (NRHS, P32.npad), dtype)
    Xt_p = Xt_p.at[:, :P32.L].set(0).at[:, P32.L + n:].set(0)

    # cross-check the two kernels on the same logical X (row 0)
    y_s = dia_stream.spmm_sdia_padded_t(S32, Xt_s)[0][S32.L:S32.L + n]
    y_p = dia_stream.spmm_psdia_padded_t(P32, Xt_p)[0][P32.L:P32.L + n]
    x0s = Xt_s[0][S32.L:S32.L + n]
    x0p = Xt_p[0][P32.L:P32.L + n]
    assert jnp.max(jnp.abs(x0s - x0p)) == 0  # same logical input
    rel = float(jnp.max(jnp.abs(y_s - y_p)) / jnp.max(jnp.abs(y_s)))
    print(f"sdia-vs-psdia rel = {rel:.3e}", flush=True)
    assert rel < 2e-5

    dt_s = time_chained(
        lambda C, Ad: dia_stream.spmm_sdia_padded_t(Ad, C) * scale, Xt_s,
        iters=40, warm=4, operands=(S32,))
    print(f"sdia  spmm{NRHS}: {dt_s * 1e3:.3f} ms "
          f"({2 * A_dia.nnz * NRHS / dt_s / 1e9:.0f} GFLOP/s)", flush=True)
    dt_p = time_chained(
        lambda C, Ad: dia_stream.spmm_psdia_padded_t(Ad, C) * scale, Xt_p,
        iters=40, warm=4, operands=(P32,))
    print(f"psdia spmm{NRHS}: {dt_p * 1e3:.3f} ms "
          f"({2 * A_dia.nnz * NRHS / dt_p / 1e9:.0f} GFLOP/s)  "
          f"[{dt_s / dt_p:.2f}x vs sdia]", flush=True)


if __name__ == "__main__":
    main()
