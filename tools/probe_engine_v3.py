#!/usr/bin/env python
"""Probe: engine-v3 stage-3 shape vs the current (v2) one, on chip.

v2 stage-3 (per tile): stack8 exchange -> T -> G(b2) -> T -> G(b3) ->
  * vals -> [rp128,128] @ [128,16] mask-dot (partials [rp128, 16]).
v3 stage-3: stack8 -> * vals (exchange layout) -> T -> G(b2) ->
  [16,128] @ [128,128] transposed mask-dot (partials [16, 128]).

v3 needs the color-as-final-lane routing (b1/b3 disappear); this probe
measures ONLY the kernel-side win with dummy planes to decide whether the
router work is worth it.  Expected ~336 ns/tile (one transpose at 240 +
one lane-gather at 96).
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
RP = 104          # rp128 at slack 0.15


def log(*a):
    print(*a, flush=True)


def tile_spec(shape=(1, Q, Q)):
    nd = len(shape) - 1
    return pl.BlockSpec(shape, lambda t, nd=nd: (t,) + (0,) * nd,
                        memory_space=pltpu.VMEM)


def run_variant(name, kernel, operands, out_shape, extra_specs=()):
    def step(z, *ops):
        o = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(T,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            + list(extra_specs),
            out_specs=tile_spec((1,) + out_shape.shape[1:]),
        )(z, *ops)
        bump = jnp.pad(o.reshape(-1)[:Q] * 1e-6, (0, z.size - Q))
        return z * 0.999 + bump.reshape(z.shape)

    dt = time_chained(step, operands[0], iters=300, warm=20,
                      operands=tuple(operands[1:]))
    log(f"{name:34s}: {dt * 1e6:7.1f} us ({dt / T * 1e9:6.0f} ns/tile)")
    return dt


def main():
    rng = np.random.default_rng(0)
    z2d = jnp.asarray(rng.random((T * Q, Q)), jnp.float32)
    rowsrc = jnp.asarray(rng.permutation(T * Q).astype(np.int32))
    g = jnp.asarray(
        np.stack([np.stack([rng.permutation(Q) for _ in range(Q)])
                  for _ in range(T)]).astype(np.int8))
    vals_rp = jnp.asarray(rng.random((T, RP, Q)), jnp.float32)
    vals_full = jnp.asarray(rng.random((T, Q, Q)), jnp.float32)
    mask = jnp.asarray((np.arange(Q)[:, None] // 8
                        == np.arange(16)[None, :]), jnp.float32)
    mask_t = jnp.asarray(mask.T)        # [16, 128]

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    def stack8_all(z_ref, rs_ref, t):
        def stack8(s):
            base = t * Q + s * 8
            return jnp.stack([z_ref[rs_ref[base + i], :] for i in range(8)])

        return jnp.concatenate([stack8(s) for s in range(Q // 8)])

    # --- v2: exchange + T G T G + mul + [rp,128]@[128,16] dot ------------
    def k_v2(z_ref, rs_ref, b2_ref, b3_ref, v_ref, m_ref, o_ref):
        t = pl.program_id(0)
        zz = stack8_all(z_ref, rs_ref, t)
        zz = zz.T
        zz = jnp.take_along_axis(zz, b2_ref[0].astype(jnp.int32), axis=1)
        zz = zz.T
        zz = jnp.take_along_axis(zz, b3_ref[0].astype(jnp.int32), axis=1)
        prod = zz[:RP] * v_ref[0]
        o_ref[0] = lax.dot_general(
            prod, m_ref[:], (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    run_variant(
        "v2: exch TGTG mul dot", k_v2,
        (z2d, rowsrc, g, g, vals_rp, mask),
        jax.ShapeDtypeStruct((T, RP, 16), jnp.float32),
        extra_specs=[smem, tile_spec(), tile_spec(),
                     tile_spec((1, RP, Q)), vmem])

    # --- v3: exchange + mul + T + G + [16,128]@[128,128] dot -------------
    def k_v3(z_ref, rs_ref, b2_ref, v_ref, mt_ref, o_ref):
        t = pl.program_id(0)
        zz = stack8_all(z_ref, rs_ref, t)
        prod = zz * v_ref[0]
        prod = prod.T
        prod = jnp.take_along_axis(prod, b2_ref[0].astype(jnp.int32),
                                   axis=1)
        o_ref[0] = lax.dot_general(
            mt_ref[:], prod, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    run_variant(
        "v3: exch mul T G dot_t", k_v3,
        (z2d, rowsrc, g, vals_full, mask_t),
        jax.ShapeDtypeStruct((T, 16, Q), jnp.float32),
        extra_specs=[smem, tile_spec(), tile_spec(), vmem])

    # --- v3 sanity variants: isolate where the time moves ----------------
    def k_v3_nodot(z_ref, rs_ref, b2_ref, v_ref, o_ref):
        t = pl.program_id(0)
        zz = stack8_all(z_ref, rs_ref, t)
        prod = zz * v_ref[0]
        prod = prod.T
        o_ref[0] = jnp.take_along_axis(prod, b2_ref[0].astype(jnp.int32),
                                       axis=1)

    run_variant(
        "v3 minus dot (exch mul T G)", k_v3_nodot,
        (z2d, rowsrc, g, vals_full),
        jax.ShapeDtypeStruct((T, Q, Q), jnp.float32),
        extra_specs=[smem, tile_spec(), tile_spec()])


if __name__ == "__main__":
    main()
