"""Micro-probe: per-tile TGTG variants — can the MXU take one (or both)
transposes so VPU gathers and MXU transposes overlap across the per-rhs
loop?  dot_general(z, I, contract dim0 x dim0) == z.T exactly at
Precision.HIGHEST (one-hot rows: 1.0*v with zero additions).
"""
import sys
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_spmv.bench.harness import time_chained


def log(*a):
    print(*a, flush=True)


QB = 5
T = 100
rng = np.random.default_rng(0)
g2 = jnp.asarray(rng.integers(0, 128, (128, 128)), jnp.int32)
g3 = jnp.asarray(rng.integers(0, 128, (128, 128)), jnp.int32)
Z = jnp.asarray(rng.random((T, QB, 128, 128)), jnp.float32)
I = jnp.eye(128, dtype=jnp.float32)


def t_vpu(z):
    return z.T


def t_mxu(z):
    return lax.dot_general(z, I, (((0,), (0,)), ((), ())),
                           precision=lax.Precision.HIGHEST,
                           preferred_element_type=z.dtype)


def make_kernel(f1, f2, alternate=False):
    def kern(z_ref, g2_ref, g3_ref, i_ref, o_ref):
        def t_mxu_r(z):
            return lax.dot_general(z, i_ref[:], (((0,), (0,)), ((), ())),
                                   precision=lax.Precision.HIGHEST,
                                   preferred_element_type=z.dtype)
        fns = {t_mxu: t_mxu_r, t_vpu: t_vpu}
        def tgtg(z, a, b):
            z = fns[a](z)
            z = jnp.take_along_axis(z, g2_ref[:], axis=1)
            z = fns[b](z)
            return jnp.take_along_axis(z, g3_ref[:], axis=1)
        for q in range(QB):
            if alternate and (q % 2 == 1):
                o_ref[0, q] = tgtg(z_ref[0, q], t_mxu, t_vpu)
            else:
                o_ref[0, q] = tgtg(z_ref[0, q], f1, f2)
    return kern


def run(tag, f1, f2, alternate=False):
    fn = pl.pallas_call(
        make_kernel(f1, f2, alternate),
        out_shape=jax.ShapeDtypeStruct((T, QB, 128, 128), jnp.float32),
        grid=(T,),
        in_specs=[pl.BlockSpec((1, QB, 128, 128), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, QB, 128, 128), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    ref = pl.pallas_call(
        make_kernel(t_vpu, t_vpu),
        out_shape=jax.ShapeDtypeStruct((T, QB, 128, 128), jnp.float32),
        grid=(T,),
        in_specs=[pl.BlockSpec((1, QB, 128, 128), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, QB, 128, 128), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    err = float(jnp.max(jnp.abs(fn(Z, g2, g3, I)[0] - ref(Z, g2, g3, I)[0])))
    sc = jnp.float32(1.0)
    dt = time_chained(lambda c, a, b, ii: fn(c, a, b, ii) * sc, Z,
                      iters=50, warm=5, operands=(g2, g3, I))
    log(f"{tag:22s}: {dt*1e6:8.1f} us total, "
        f"{dt*1e9/(T*QB):6.1f} ns/tgtg, err={err:.1e}")


run("vpu-vpu (current)", t_vpu, t_vpu)
run("mxu-vpu", t_mxu, t_vpu)
run("vpu-mxu", t_vpu, t_mxu)
run("mxu-mxu", t_mxu, t_mxu)
run("alternate rhs", t_vpu, t_vpu, alternate=True)
