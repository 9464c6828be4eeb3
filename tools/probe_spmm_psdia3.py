"""Probe 3: PSDIA 32-RHS SpMM with a 2-D (rhs-group, row-tile) grid.

The 1-D grid loads [32, rb] x blocks and stores [32, rb] y blocks per
step; measured 13.5 ms ≈ DMA (7.1) + VPU (~8) NOT overlapping.  Smaller
per-step blocks ([qb, rb]) give the pipeliner room to double-buffer both
directions.  Sweeps qb and grid order.

Run standalone (owns the chip): python tools/probe_spmm_psdia3.py
"""

import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import build_poisson_dia_device
from tpu_spmv.bench.harness import time_chained
from tpu_spmv.kernels import dia_stream
from tpu_spmv.kernels.dia_stream import _halo_size, _pspmm_kernel

GRID = 4096
NRHS = 32


def spmm_psdia_2d(A, Xt_pad, *, qb: int, order: str = "qj"):
    rb = A.rb
    npad = A.npad
    T = npad // rb
    nd = A.ndiags
    nrhs = int(Xt_pad.shape[0])
    assert nrhs % qb == 0
    h = _halo_size(A.offsets, rb)
    hb = rb // h
    TH = npad // h

    if order == "qj":
        grid = (nrhs // qb, T)
        qi, ji = (lambda q, j: q), (lambda q, j: j)
    else:
        grid = (T, nrhs // qb)
        qi, ji = (lambda j, q: q), (lambda j, q: j)

    kern = functools.partial(_pspmm_kernel, offsets=A.offsets, rb=rb, h=h,
                             L=A.L, nrow=A.shape[0], pid_axis=order.index("j"))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nrhs, npad), A.pattern.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nd, rb), lambda *g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, h),
                         lambda *g: (qi(*g),
                                     jnp.clip(ji(*g) * hb - 1, 0, TH - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, rb), lambda *g: (qi(*g), ji(*g)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, h),
                         lambda *g: (qi(*g),
                                     jnp.clip((ji(*g) + 1) * hb, 0, TH - 1)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qb, rb), lambda *g: (qi(*g), ji(*g)),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(A.pattern, Xt_pad, Xt_pad, Xt_pad)


def main():
    dtype = jnp.float32
    A_dia = build_poisson_dia_device(GRID, dtype)
    n = GRID * GRID
    scale = jnp.asarray(1.0 / 8.0, dtype)
    nnz = A_dia.nnz

    P32 = dia_stream.pack_psdia(A_dia, period=GRID, rb=65536)
    Xt = jax.random.uniform(jax.random.PRNGKey(7), (NRHS, P32.npad), dtype)
    Xt = Xt.at[:, :P32.L].set(0).at[:, P32.L + n:].set(0)

    # correctness once vs the 1-D kernel
    y1 = dia_stream.spmm_psdia_padded_t(P32, Xt)
    y2 = spmm_psdia_2d(P32, Xt, qb=8, order="qj")
    rel = float(jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y1)))
    print(f"2d-vs-1d rel = {rel:.3e}", flush=True)
    assert rel == 0.0

    for qb, order in [(8, "qj"), (8, "jq"), (16, "qj"), (4, "qj")]:
        jax.clear_caches()
        dt = time_chained(
            lambda C, Ad: spmm_psdia_2d(Ad, C, qb=qb, order=order) * scale,
            Xt, iters=40, warm=4, operands=(P32,))
        gbps = (2 * 4 * NRHS * n) / dt / 1e9
        print(f"qb={qb:2d} order={order}: {dt * 1e3:7.3f} ms "
              f"({2 * nnz * NRHS / dt / 1e9:4.0f} GFLOP/s, "
              f"{gbps:4.0f} GB/s x+y)", flush=True)


if __name__ == "__main__":
    main()
