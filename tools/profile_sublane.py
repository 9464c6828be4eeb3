#!/usr/bin/env python
"""Probe: sublane-wise gather inside a Mosaic kernel.

The Clos tile permutation's middle stage routes along SUBLANES; the
current kernels express it as T-G-T (two [128,128] f32 transposes at
~240 ns/tile each — the single most expensive primitive, 4x a
lane-gather).  If ``take_along_axis(z, idx, axis=0)`` lowers and runs
near lane-gather speed, every engine pass drops both transposes:
G-T-G-T-G becomes G-S-G (indices pre-transposed at pack time).

Variants: S alone, G-S-G, exchange + S-G (b1 folded), exchange + S-G +
fused mask-dot reduce — mirrored against the round-2 measured numbers in
tools/profile_engine.py.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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

    try:
        dt = time_chained(step, operands[0], iters=300, warm=20,
                          operands=tuple(operands[1:]))
    except Exception as e:
        log(f"{name:28s}: FAILED {type(e).__name__}: {str(e)[:120]}")
        return None
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
    z2d = z.reshape(T * Q, Q)

    # correctness oracle for the sublane gather, interpret-free: tiny case
    # first on the real chip with assert via host comparison
    zt = z[0]
    gt = g[0].astype(jnp.int32)

    def k_sub1(z_ref, g_ref, o_ref):
        o_ref[0] = jnp.take_along_axis(
            z_ref[pl.program_id(0)], g_ref[0].astype(jnp.int32), axis=0)

    # one-shot correctness check before timing
    try:
        out = pl.pallas_call(
            k_sub1,
            out_shape=jax.ShapeDtypeStruct((1, Q, Q), jnp.float32),
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), tile_spec()],
            out_specs=tile_spec(),
        )(zt[None], gt[None].astype(jnp.int8))
        want = np.take_along_axis(np.asarray(zt), np.asarray(gt), axis=0)
        ok = np.array_equal(np.asarray(out[0]), want)
        log(f"sublane take_along_axis(axis=0): lowers, correct={ok}")
    except Exception as e:
        log(f"sublane take_along_axis(axis=0): FAILED "
            f"{type(e).__name__}: {str(e)[:200]}")
        return 1

    run_variant("1 sublane-gather (S)", k_sub1, (z, g),
                extra_specs=[tile_spec()])

    # --- G-S-G: the transpose-free tile permutation ---
    def k_gsg(z_ref, g_ref, o_ref):
        t = pl.program_id(0)
        gg = g_ref[0].astype(jnp.int32)
        zz = jnp.take_along_axis(z_ref[t], gg, axis=1)
        zz = jnp.take_along_axis(zz, gg, axis=0)
        o_ref[0] = jnp.take_along_axis(zz, gg, axis=1)

    run_variant("G-S-G (no transposes)", k_gsg, (z, g),
                extra_specs=[tile_spec()])

    # --- exchange + S-G (b1 folded into upstream a3) ---
    def k_exch_sg(z_ref, rs_ref, g_ref, o_ref):
        t = pl.program_id(0)

        def stack8(s):
            base = t * Q + s * 8
            return jnp.stack([z_ref[rs_ref[base + i], :] for i in range(8)])

        zz = jnp.concatenate([stack8(s) for s in range(Q // 8)])
        gg = g_ref[0].astype(jnp.int32)
        zz = jnp.take_along_axis(zz, gg, axis=0)
        o_ref[0] = jnp.take_along_axis(zz, gg, axis=1)

    run_variant("exchange + S-G (s23 v2)", k_exch_sg, (z2d, rowsrc, g),
                extra_specs=[smem, tile_spec()])

    # --- exchange + S-G + fused mask-dot reduce ---
    def k_exch_sg_red(z_ref, rs_ref, g_ref, v_ref, m_ref, o_ref):
        t = pl.program_id(0)

        def stack8(s):
            base = t * Q + s * 8
            return jnp.stack([z_ref[rs_ref[base + i], :] for i in range(8)])

        zz = jnp.concatenate([stack8(s) for s in range(Q // 8)])
        gg = g_ref[0].astype(jnp.int32)
        zz = jnp.take_along_axis(zz, gg, axis=0)
        zz = jnp.take_along_axis(zz, gg, axis=1)
        prod = zz * v_ref[0]
        o_ref[0] = lax.dot_general(
            prod, m_ref[:], (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    run_variant(
        "exch + S-G + psum8 dot", k_exch_sg_red, (z2d, rowsrc, g, z, mask),
        out_shape=jax.ShapeDtypeStruct((T, Q, 16), jnp.float32),
        extra_specs=[smem, tile_spec(), tile_spec(),
                     pl.BlockSpec(memory_space=pltpu.VMEM)])

    # --- full s1 v2: x-gather (a1 folded) + S + G ---
    S_x = 800
    x2d = jnp.asarray(rng.random((S_x, Q)), jnp.float32)
    gseg = jnp.asarray(rng.integers(0, S_x, T * 88).astype(np.int32))
    glidx = jnp.asarray(rng.integers(0, Q, (T * 88, Q)).astype(np.int8))

    def k_s1v2(x_ref, gs_ref, gl_ref, g_ref, o_ref):
        t = pl.program_id(0)
        groups = []
        for gi in range(88 // 8):
            base = t * 88 + gi * 8
            tile = jnp.stack([x_ref[gs_ref[base + i], :] for i in range(8)])
            idx = gl_ref[gi * 8:(gi + 1) * 8].astype(jnp.int32)
            groups.append(jnp.take_along_axis(tile, idx, axis=1))
        zz = jnp.concatenate(groups, axis=0)
        zz = jnp.pad(zz, ((0, Q - 88), (0, 0)))
        gg = g_ref[0].astype(jnp.int32)
        zz = jnp.take_along_axis(zz, gg, axis=0)
        o_ref[0] = jnp.take_along_axis(zz, gg, axis=1)

    def step_s1(x2d_, gs, gl, g_):
        o = pl.pallas_call(
            k_s1v2,
            out_shape=jax.ShapeDtypeStruct((T, Q, Q), jnp.float32),
            grid=(T,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((88, Q), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                tile_spec(),
            ],
            out_specs=tile_spec(),
        )(x2d_, gs, gl, g_)
        bump = jnp.pad(o.reshape(-1)[:Q] * 1e-6, (0, x2d_.size - Q))
        return x2d_ * 0.999 + bump.reshape(x2d_.shape)

    try:
        dt = time_chained(step_s1, x2d, iters=300, warm=20,
                          operands=(gseg, glidx, g))
        log(f"{'s1 v2 (xgather+S+G)':28s}: {dt * 1e6:7.1f} us "
            f"({dt / T * 1e9:6.0f} ns/tile)")
    except Exception as e:
        log(f"s1 v2: FAILED {type(e).__name__}: {str(e)[:120]}")

    return 0


if __name__ == "__main__":
    sys.exit(main())
