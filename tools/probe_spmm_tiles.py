"""Probe 4: PSDIA 32-RHS SpMM in TILE-MAJOR layout.

probe_floor showed the [nrhs, npad] kernel is DMA-ceiling-bound at
~320 GB/s regardless of compute (even a 1-diagonal copy kernel): its
[nrhs, rb] blocks are strided HBM transfers (nrhs rows x rb*4 B with an
npad*4 B pitch).  SpMV's contiguous 1-D blocks reach 528 GB/s on the
same machine.  This probe lays X out tile-major — [T*hb, nrhs, h] with
h the halo block — so every BlockSpec block (x0 [hb,nrhs,h], halos
[1,nrhs,h], y [hb,nrhs,h]) is fully contiguous, and computes per
h-sub-block inside the kernel (windows never cross more than one
neighbor because h >= band).

Run standalone (owns the chip): python tools/probe_spmm_tiles.py
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
from tpu_spmv.kernels.dia_stream import _halo_size

GRID = 4096
NRHS = 32


def _tile_kernel(pat_ref, xm_ref, x0_ref, xp_ref, o_ref, *,
                 offsets, rb, h, L, nrow):
    hb = rb // h
    j = pl.program_id(0)
    interior = jnp.logical_and(j * rb >= L, (j + 1) * rb <= L + nrow)
    for b in range(hb):
        left = xm_ref[0] if b == 0 else x0_ref[b - 1]
        mid = x0_ref[b]
        right = xp_ref[0] if b == hb - 1 else x0_ref[b + 1]
        win = jnp.concatenate([left, mid, right], axis=1)   # [nrhs, 3h]
        acc = None
        for d, off in enumerate(offsets):
            c = jnp.expand_dims(
                jax.lax.slice_in_dim(pat_ref[d], b * h, (b + 1) * h), 0)
            t = c * jax.lax.slice_in_dim(win, h + off, 2 * h + off, axis=1)
            acc = t if acc is None else acc + t

        @pl.when(interior)
        def _(b=b, acc=acc):
            o_ref[b] = acc

        @pl.when(jnp.logical_not(interior))
        def _(b=b, acc=acc):
            rows = (j * rb + b * h
                    + jax.lax.broadcasted_iota(jnp.int32, (1, h), 1))
            valid = (rows >= L) & (rows < L + nrow)
            o_ref[b] = jnp.where(valid, acc, jnp.zeros_like(acc))


def spmm_psdia_tiles(A, X3):
    """X3: [TH, nrhs, h] tile-major; returns Y3 same layout."""
    rb = A.rb
    npad = A.npad
    T = npad // rb
    nd = A.ndiags
    h = _halo_size(A.offsets, rb)
    hb = rb // h
    TH = npad // h
    nrhs = int(X3.shape[1])
    assert X3.shape == (TH, nrhs, h)

    return pl.pallas_call(
        functools.partial(_tile_kernel, offsets=A.offsets, rb=rb, h=h,
                          L=A.L, nrow=A.shape[0]),
        out_shape=jax.ShapeDtypeStruct((TH, nrhs, h), A.pattern.dtype),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((nd, rb), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nrhs, h),
                         lambda j: (jnp.clip(j * hb - 1, 0, TH - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, nrhs, h), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nrhs, h),
                         lambda j: (jnp.clip((j + 1) * hb, 0, TH - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hb, nrhs, h), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(A.pattern, X3, X3, X3)


def main():
    dtype = jnp.float32
    A_dia = build_poisson_dia_device(GRID, dtype)
    n = GRID * GRID
    scale = jnp.asarray(1.0 / 8.0, dtype)
    nnz = A_dia.nnz

    P32 = dia_stream.pack_psdia(A_dia, period=GRID, nrhs=NRHS)
    h = _halo_size(P32.offsets, P32.rb)
    TH = P32.npad // h
    Xt = jax.random.uniform(jax.random.PRNGKey(7), (NRHS, P32.npad), dtype)
    Xt = Xt.at[:, :P32.L].set(0).at[:, P32.L + n:].set(0)
    X3 = jnp.swapaxes(Xt.reshape(NRHS, TH, h), 0, 1)
    print(f"rb={P32.rb} h={h} TH={TH} hb={P32.rb // h}", flush=True)

    # correctness vs the [nrhs, npad] kernel
    y1 = dia_stream.spmm_psdia_padded_t(P32, Xt)
    y3 = spmm_psdia_tiles(P32, X3)
    y3_flat = jnp.swapaxes(y3, 0, 1).reshape(NRHS, P32.npad)
    rel = float(jnp.max(jnp.abs(y1 - y3_flat)) / jnp.max(jnp.abs(y1)))
    print(f"tiles-vs-flat rel = {rel:.3e}", flush=True)
    assert rel == 0.0, rel

    dt = time_chained(
        lambda C, Ad: spmm_psdia_tiles(Ad, C) * scale,
        X3, iters=40, warm=4, operands=(P32,))
    gbps = (2 * 4 * NRHS * n) / dt / 1e9
    print(f"tile-major spmm32: {dt * 1e3:7.3f} ms "
          f"({2 * nnz * NRHS / dt / 1e9:4.0f} GFLOP/s, "
          f"{gbps:4.0f} GB/s x+y)", flush=True)


if __name__ == "__main__":
    main()
