#!/usr/bin/env python
"""On-chip stage profile of the GPR SpMV pipeline.

Times cumulative prefixes of the pipeline (gather+s1 | +stage23 | +reduce
| full) with the chained protocol and differences them into per-stage
costs, plus standalone probes:

- the y-permutation pass alone (engine pass on ~nrow elements);
- a minimal pallas launch (per-launch fixed cost on this backend);
- XLA whole-row gather ``take(z, rowsrc, axis=0)`` on the exchange-sized
  buffer — the candidate HBM-resident stage-2 replacement (engine v2).

Usage: python tools/profile_gpr.py  (runs on the real chip; ~2 min)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_spmv.bench.harness import time_chained
from tpu_spmv.kernels import gpr, permute as perm
from tpu_spmv.utils import random_sparse


def log(*a):
    print(*a, flush=True)


def main():
    n = 100_000
    sp_mat = random_sparse(n, n, 7e-5, seed=2, dtype=np.float32)
    t0 = time.time()
    A = gpr.pack_gpr(sp_mat, dtype=np.float32)
    log(f"pack {sp_mat.nnz} nnz in {time.time() - t0:.1f}s; "
        f"plan T={A.plan.ntiles} rp={A.plan.real_per_tile} "
        f"Ttot(vals)={A.ntiles} NS8={A.nsub} side={A.side.nnz} "
        f"yplan={'None' if A.yplan is None else type(A.yplan).__name__}")

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random(n), jnp.float32)
    S = -(-n // 128)
    scale = np.float32(0.01)

    def to_x2d(c):
        xpad = jnp.pad(c, (0, S * 128 - n)) if S * 128 != n else c
        return xpad.reshape(S, 128)

    # P1: gather + stage 1 only
    def p1(c, A):
        z = gpr._run_stage1_fused(A, to_x2d(c))
        return z.reshape(-1)[:n] * scale

    # P2: + fused stage 2/3 + mask-dot reduce (partials)
    def p2(c, A):
        z = gpr._run_stage1_fused(A, to_x2d(c))
        P = gpr._run_s23_reduce_fused(A, z)
        f = P.reshape(-1)[:n]
        return f * scale

    # P3: + class combine (width-8 partial sums -> y_sorted)
    def p3(c, A):
        z = gpr._run_stage1_fused(A, to_x2d(c))
        P = gpr._run_s23_reduce_fused(A, z)
        rp128 = A.plan.real_per_tile // 128
        parts = gpr._combine_partials(
            P.reshape(A.plan.ntiles * rp128, 16), A.class_tiles)
        y_sorted = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        if y_sorted.shape[0] < n:
            y_sorted = jnp.pad(y_sorted, (0, n - y_sorted.shape[0]))
        return y_sorted[:n] * scale

    # P4: full pipeline
    def p4(c, A):
        return gpr.spmv_gpr(A, c) * scale

    res = {}
    for name, fn in [("p1_s1", p1), ("p2_s23red", p2), ("p3_combine", p3),
                     ("p4_full", p4)]:
        dt = time_chained(fn, x, iters=200, warm=20, operands=(A,))
        res[name] = dt
        log(f"{name}: {dt * 1e6:8.1f} us")
    log(f"stage s1       : {res['p1_s1'] * 1e6:8.1f} us")
    log(f"stage s23+red  : {(res['p2_s23red'] - res['p1_s1']) * 1e6:8.1f} us")
    log(f"stage combine  : {(res['p3_combine'] - res['p2_s23red']) * 1e6:8.1f} us")
    log(f"stage yplan+   : {(res['p4_full'] - res['p3_combine']) * 1e6:8.1f} us")

    # standalone: the y permutation pass on [n]
    if A.yplan is not None:
        dt = time_chained(
            lambda c, p: perm.apply_permutation(p, c) * scale, x,
            iters=200, warm=20, operands=(A.yplan,))
        log(f"yplan alone    : {dt * 1e6:8.1f} us "
            f"(T={A.yplan.ntiles if hasattr(A.yplan, 'ntiles') else '2lvl'})")

    # standalone: minimal pallas launch (fixed cost)
    def _copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    small = jnp.ones((128, 128), jnp.float32)

    def launch_probe(c):
        out = pl.pallas_call(
            _copy_kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(c)
        return out * scale

    dt = time_chained(launch_probe, small, iters=400, warm=20)
    log(f"1 pallas launch: {dt * 1e6:8.1f} us")

    def launch_probe4(c):
        for _ in range(4):
            c = pl.pallas_call(
                _copy_kernel,
                out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(c)
        return c * scale

    dt4 = time_chained(launch_probe4, small, iters=400, warm=20)
    log(f"4 pallas launch: {dt4 * 1e6:8.1f} us (marginal "
        f"{(dt4 - dt) / 3 * 1e6:.1f} us/launch)")

    # XLA whole-row gather at exchange scale (engine-v2 candidate):
    # z [R, 128] f32, rowsrc [R] — how fast does XLA move whole rows?
    for R in (8192, 65536, 262144):
        z = jnp.asarray(rng.random((R, 128)), jnp.float32)
        rs = jnp.asarray(rng.permutation(R).astype(np.int32))

        def rowgather(c, rs):
            return jnp.take(c, rs, axis=0) * np.float32(1.0)

        dt = time_chained(rowgather, z, iters=50, warm=5, operands=(rs,))
        gbps = 2 * R * 128 * 4 / dt / 1e9
        log(f"xla row-gather R={R:7d}: {dt * 1e6:8.1f} us = {gbps:6.1f} GB/s "
            f"({R / dt / 1e6:.1f} Mrows/s)")

    return 0


if __name__ == "__main__":
    sys.exit(main())
