#!/usr/bin/env python
"""Streaming-DIA window formulation probe: full 3-piece window concat +
per-diagonal slice (current) vs per-diagonal two-piece concat (skips the
[*, rb+2h] window materialization).  SpMV and 32-RHS SpMM variants on
the 4096-grid Poisson."""

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


def _kernel_piecewise(data_ref, xm_ref, x0_ref, xp_ref, o_ref, *,
                      offsets, rb, h):
    x0 = x0_ref[:]
    acc = None
    for d, off in enumerate(offsets):
        if off == 0:
            sl = x0
        elif off < 0:
            sl = jnp.concatenate(
                [xm_ref[h + off:], x0[: rb + off]])
        else:
            sl = jnp.concatenate([x0[off:], xp_ref[:off]])
        term = data_ref[d] * sl
        acc = term if acc is None else acc + term
    o_ref[:] = acc


def _spmm_kernel_piecewise(data_ref, xm_ref, x0_ref, xp_ref, o_ref, *,
                           offsets, rb, h):
    x0 = x0_ref[:]
    acc = None
    for d, off in enumerate(offsets):
        if off == 0:
            sl = x0
        elif off < 0:
            sl = jnp.concatenate(
                [xm_ref[:, h + off:], x0[:, : rb + off]], axis=1)
        else:
            sl = jnp.concatenate([x0[:, off:], xp_ref[:, :off]], axis=1)
        term = data_ref[d][None, :] * sl
        acc = term if acc is None else acc + term
    o_ref[:] = acc


def main():
    A = build_poisson_dia_device(GRID, jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (A.shape[0],), jnp.float32)
    scale = np.float32(1 / 8.0)
    S = dia_stream.pack_sdia(A)
    xp = dia_stream.pad_x(S, x)
    ref = np.asarray(dia_stream.spmv_sdia_padded(S, xp))

    for name, kern in (("window (current)", dia_stream._kernel),
                       ("piecewise", _kernel_piecewise)):
        dia_stream._kernel = kern
        out = np.asarray(dia_stream.spmv_sdia_padded(S, xp))
        ok = np.allclose(out, ref, rtol=1e-6, atol=1e-6)
        dt = time_chained(
            lambda c, Ad: dia_stream.spmv_sdia_padded(Ad, c) * scale, xp,
            iters=200, warm=10, operands=(S,))
        log(f"spmv {name:18s}: {dt * 1e3:6.3f} ms  correct={ok}")

    NRHS = 32
    S32 = dia_stream.pack_sdia(A, nrhs=NRHS)
    Xt = jax.random.uniform(jax.random.PRNGKey(7), (NRHS, S32.npad),
                            jnp.float32)
    ref2 = np.asarray(dia_stream.spmm_sdia_padded_t(S32, Xt)[0])
    for name, kern in (("window (current)", dia_stream._spmm_kernel),
                       ("piecewise", _spmm_kernel_piecewise)):
        dia_stream._spmm_kernel = kern
        out = np.asarray(dia_stream.spmm_sdia_padded_t(S32, Xt)[0])
        ok = np.allclose(out, ref2, rtol=1e-6, atol=1e-6)
        dt = time_chained(
            lambda C, Ad: dia_stream.spmm_sdia_padded_t(Ad, C) * scale, Xt,
            iters=30, warm=3, operands=(S32,))
        log(f"spmm {name:18s}: {dt * 1e3:6.2f} ms  correct={ok}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
