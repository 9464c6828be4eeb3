#!/usr/bin/env python
"""Microbenchmark GPR reduce variants: the [tps*8,128] -> [tps*8,16]
width-8 segmented lane reduction (mask-dot MXU vs VPU alternatives)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_spmv.bench.harness import time_chained

Q = 128
TPS = 64          # vals tiles per step
STEPS = 16        # ~996 tiles like the GPR bench
T = TPS * STEPS


def log(*a):
    print(*a, flush=True)


def run(name, kernel, ops, out_cols, timeout_note=""):
    out_shape = jax.ShapeDtypeStruct((STEPS, TPS * 8, out_cols), jnp.float32)

    def step(v, *rest):
        o = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(STEPS,),
            in_specs=[pl.BlockSpec((1, TPS * 8, Q), lambda s: (s, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(ops) - 1),
            out_specs=pl.BlockSpec((1, TPS * 8, out_cols),
                                   lambda s: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(v, *rest)
        bump = jnp.pad(o.reshape(-1)[:Q] * 1e-6, (0, v.size - Q))
        return v * 0.999 + bump.reshape(v.shape)

    dt = time_chained(step, ops[0], iters=300, warm=20,
                      operands=tuple(ops[1:]))
    log(f"{name:32s}: {dt * 1e6:7.1f} us ({dt / T * 1e9:6.0f} ns/valtile)")


def main():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.random((STEPS, TPS * 8, Q)), jnp.float32)
    mask = jnp.asarray((np.arange(Q)[:, None] // 8
                        == np.arange(16)[None, :]), jnp.float32)

    def k_dot_highest(v_ref, m_ref, o_ref):
        o_ref[0] = lax.dot_general(
            v_ref[0], m_ref[:], (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    run("mask-dot HIGHEST", k_dot_highest, (v, mask), 16)

    def k_dot_high(v_ref, m_ref, o_ref):
        o_ref[0] = lax.dot_general(
            v_ref[0], m_ref[:], (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGH,
            preferred_element_type=jnp.float32)

    run("mask-dot HIGH", k_dot_high, (v, mask), 16)

    def k_strided(v_ref, o_ref):
        x = v_ref[0]
        for _ in range(3):
            x = x[:, 0::2] + x[:, 1::2]
        o_ref[0] = x

    run("strided halving adds", k_strided, (v,), 16)

    def k_slicepair(v_ref, o_ref):
        # halving via contiguous halves + one gather-free interleave?
        # sum groups of 8 by 3 rounds of (even, odd) via lax.slice strides
        x = v_ref[0]
        for _ in range(3):
            n = x.shape[1]
            x = (lax.slice(x, (0, 0), (x.shape[0], n), (1, 2))
                 + lax.slice(x, (0, 1), (x.shape[0], n), (1, 2)))
        o_ref[0] = x

    run("lax.slice strided adds", k_slicepair, (v,), 16)

    def k_reshape_sum(v_ref, o_ref):
        o_ref[0] = v_ref[0].reshape(TPS * 8, 16, 8).sum(axis=2)

    run("reshape [.,16,8] sum", k_reshape_sum, (v,), 16)

    return 0


if __name__ == "__main__":
    sys.exit(main())
