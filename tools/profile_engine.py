#!/usr/bin/env python
"""Microbenchmark the permutation engine's in-kernel primitives on chip.

Isolates the cost of each stage-23 ingredient at the GPR bench's scale
(T=91 tiles): the row exchange (stack8 dynamic reads), the G-T-G-T-G
tile permutation, its transposes (VPU vs MXU identity-dot), and a fused
exchange+GTGTG+mask-dot variant — to decide where the 92.5 us goes.
"""

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
T = 91


def log(*a):
    print(*a, flush=True)


def tile_spec():
    return pl.BlockSpec((1, Q, Q), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)


def run_variant(name, kernel, operands, out_shape=None, extra_specs=()):
    """Time a grid-(T,) pallas kernel: z [T,128,128] + planes -> out."""
    out_shape = out_shape or jax.ShapeDtypeStruct((T, Q, Q), jnp.float32)

    def step(z, *ops):
        o = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(T,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            + list(extra_specs),
            out_specs=(tile_spec() if out_shape.shape[1:] == (Q, Q)
                       else pl.BlockSpec(
                           (1,) + out_shape.shape[1:],
                           lambda t: (t,) + (0,) * (len(out_shape.shape) - 1),
                           memory_space=pltpu.VMEM)),
        )(z, *ops)
        bump = jnp.pad(o.reshape(-1)[:Q] * 1e-6, (0, z.size - Q))
        return z * 0.999 + bump.reshape(z.shape)

    dt = time_chained(step, operands[0], iters=300, warm=20,
                      operands=tuple(operands[1:]))
    log(f"{name:28s}: {dt * 1e6:7.1f} us ({dt / T * 1e9:6.0f} ns/tile)")
    return dt


def main():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.random((T, Q, Q)), jnp.float32)
    rowsrc = jnp.asarray(rng.permutation(T * Q).astype(np.int32))
    g = jnp.asarray(
        np.stack([np.stack([rng.permutation(Q) for _ in range(Q)])
                  for _ in range(T)]).astype(np.int8))
    mask = jnp.asarray((np.arange(Q)[:, None] // 8
                        == np.arange(16)[None, :]), jnp.float32)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    # --- baseline: copy own tile (pure traffic floor) ---
    def k_copy(z_ref, o_ref):
        o_ref[0] = z_ref[pl.program_id(0)]

    run_variant("copy own tile", k_copy, (z,))

    z2d = z.reshape(T * Q, Q)

    # --- exchange only: stack8 dynamic rows ---
    def k_exch(z_ref, rs_ref, o_ref):
        t = pl.program_id(0)

        def stack8(s):
            base = t * Q + s * 8
            return jnp.stack([z_ref[rs_ref[base + i], :] for i in range(8)])

        o_ref[0] = jnp.concatenate([stack8(s) for s in range(Q // 8)])

    run_variant("exchange (stack8)", k_exch, (z2d, rowsrc),
                extra_specs=[smem])

    # --- single lane-gather ---
    def k_g1(z_ref, g_ref, o_ref):
        t = pl.program_id(0)
        o_ref[0] = jnp.take_along_axis(
            z_ref[t], g_ref[0].astype(jnp.int32), axis=1)

    run_variant("1 lane-gather", k_g1, (z, g), extra_specs=[tile_spec()])

    # --- single transpose (VPU) ---
    def k_t(z_ref, o_ref):
        o_ref[0] = z_ref[pl.program_id(0)].T

    run_variant("1 transpose (.T)", k_t, (z,))

    # --- single transpose via MXU identity dot ---
    eye = jnp.eye(Q, dtype=jnp.float32)

    def k_tmxu(z_ref, I_ref, o_ref):
        o_ref[0] = lax.dot_general(
            z_ref[pl.program_id(0)], I_ref[:], (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    run_variant("1 transpose (MXU dot)", k_tmxu, (z, eye),
                extra_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)])

    # --- full GTGTG (no exchange) ---
    def k_gtgtg(z_ref, g_ref, o_ref):
        t = pl.program_id(0)
        gg = g_ref[0].astype(jnp.int32)
        zz = jnp.take_along_axis(z_ref[t], gg, axis=1)
        zz = zz.T
        zz = jnp.take_along_axis(zz, gg, axis=1)
        zz = zz.T
        o_ref[0] = jnp.take_along_axis(zz, gg, axis=1)

    run_variant("GTGTG", k_gtgtg, (z, g), extra_specs=[tile_spec()])

    # --- GTGTG with MXU transposes ---
    def k_gtgtg_mxu(z_ref, g_ref, I_ref, o_ref):
        t = pl.program_id(0)
        gg = g_ref[0].astype(jnp.int32)
        tr = lambda a: lax.dot_general(
            a, I_ref[:], (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        zz = jnp.take_along_axis(z_ref[t], gg, axis=1)
        zz = tr(zz)
        zz = jnp.take_along_axis(zz, gg, axis=1)
        zz = tr(zz)
        o_ref[0] = jnp.take_along_axis(zz, gg, axis=1)

    run_variant("GTGTG (MXU transposes)", k_gtgtg_mxu, (z, g, eye),
                extra_specs=[tile_spec(),
                             pl.BlockSpec(memory_space=pltpu.VMEM)])

    # --- exchange + GTGTG (current stage23) ---
    def k_s23(z_ref, rs_ref, g_ref, o_ref):
        t = pl.program_id(0)

        def stack8(s):
            base = t * Q + s * 8
            return jnp.stack([z_ref[rs_ref[base + i], :] for i in range(8)])

        zz = jnp.concatenate([stack8(s) for s in range(Q // 8)])
        gg = g_ref[0].astype(jnp.int32)
        zz = jnp.take_along_axis(zz, gg, axis=1)
        zz = zz.T
        zz = jnp.take_along_axis(zz, gg, axis=1)
        zz = zz.T
        o_ref[0] = jnp.take_along_axis(zz, gg, axis=1)

    run_variant("exchange + GTGTG (s23)", k_s23, (z2d, rowsrc, g),
                extra_specs=[smem, tile_spec()])

    # --- s23 + fused mask-dot reduce (psum8) ---
    def k_s23_red(z_ref, rs_ref, g_ref, v_ref, m_ref, o_ref):
        t = pl.program_id(0)

        def stack8(s):
            base = t * Q + s * 8
            return jnp.stack([z_ref[rs_ref[base + i], :] for i in range(8)])

        zz = jnp.concatenate([stack8(s) for s in range(Q // 8)])
        gg = g_ref[0].astype(jnp.int32)
        zz = jnp.take_along_axis(zz, gg, axis=1)
        zz = zz.T
        zz = jnp.take_along_axis(zz, gg, axis=1)
        zz = zz.T
        zz = jnp.take_along_axis(zz, gg, axis=1)
        prod = zz * v_ref[0]
        o_ref[0] = lax.dot_general(
            prod, m_ref[:], (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    run_variant(
        "s23 + fused psum8 dot", k_s23_red, (z2d, rowsrc, g, z, mask),
        out_shape=jax.ShapeDtypeStruct((T, Q, 16), jnp.float32),
        extra_specs=[smem, tile_spec(), tile_spec(),
                     pl.BlockSpec(memory_space=pltpu.VMEM)])

    # --- int8 plane upcast cost ---
    def k_upcast(z_ref, g_ref, o_ref):
        o_ref[0] = (g_ref[0].astype(jnp.int32)
                    + z_ref[pl.program_id(0)].astype(jnp.int32)
                    * 0).astype(jnp.float32)

    run_variant("i8 upcast + add", k_upcast, (z, g),
                extra_specs=[tile_spec()])

    return 0


if __name__ == "__main__":
    sys.exit(main())
