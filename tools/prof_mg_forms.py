"""On-chip probe: where does the 1.78 ms MG V-cycle go, and is a
conv-based formulation (stencil = 3x3 conv, transfers = strided conv /
conv-transpose) faster than the pad/slice one?

All chained steps are shape-preserving: transfers are timed as the
P(restrict)/prolong(R) composites.
"""
import sys
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import math
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpu_spmv.bench.harness import time_chained
from tpu_spmv.solvers.multigrid import (
    poisson_stencil_apply, _prolong, mg_preconditioner)


def log(*a):
    print(*a, flush=True)


g = 1024
u = jax.random.uniform(jax.random.PRNGKey(0), (g, g), jnp.float32)
uc = jax.random.uniform(jax.random.PRNGKey(1), (g // 2, g // 2), jnp.float32)
sc = jnp.float32(1.0 / 8.0)

# --- stencil formulations ------------------------------------------------
dt = time_chained(lambda c: poisson_stencil_apply(c) * sc, u,
                  iters=100, warm=10)
log(f"pad-stencil  1024^2: {dt*1e6:7.1f} us")

k3 = jnp.asarray([[0, -1, 0], [-1, 4, -1], [0, -1, 0]],
                 jnp.float32).reshape(3, 3, 1, 1)


def conv_stencil(x):
    return lax.conv_general_dilated(
        x[None, :, :, None], k3, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]


# correctness
err = float(jnp.max(jnp.abs(conv_stencil(u) - poisson_stencil_apply(u))))
log(f"conv-stencil err vs pad: {err:.2e}")
dt = time_chained(lambda c: conv_stencil(c) * sc, u, iters=100, warm=10)
log(f"conv-stencil 1024^2: {dt*1e6:7.1f} us")


def roll_stencil(x):
    # wrong BCs (periodic) — timing shape only
    return 4.0 * x - jnp.roll(x, 1, 0) - jnp.roll(x, -1, 0) \
        - jnp.roll(x, 1, 1) - jnp.roll(x, -1, 1)


dt = time_chained(lambda c: roll_stencil(c) * sc, u, iters=100, warm=10)
log(f"roll-stencil 1024^2: {dt*1e6:7.1f} us")

# --- smoother sweep (4x smooth + residual, the per-level fine cost) ------
def smooth4(b):
    dinv = jnp.float32(0.8 / 4.0)
    x = jnp.zeros_like(b)
    for _ in range(4):
        x = x + dinv * (b - poisson_stencil_apply(x))
    return (b - poisson_stencil_apply(x)) * sc


dt = time_chained(smooth4, u, iters=50, warm=5)
log(f"smooth4+resid pad   : {dt*1e6:7.1f} us")


def smooth4_conv(b):
    dinv = jnp.float32(0.8 / 4.0)
    x = jnp.zeros_like(b)
    for _ in range(4):
        x = x + dinv * (b - conv_stencil(x))
    return (b - conv_stencil(x)) * sc


dt = time_chained(smooth4_conv, u, iters=50, warm=5)
log(f"smooth4+resid conv  : {dt*1e6:7.1f} us")

# --- transfers: P/R composites ------------------------------------------
def restrict(r):
    zc = jnp.zeros((r.shape[0] // 2, r.shape[1] // 2), r.dtype)
    _, vjp = jax.vjp(_prolong, zc)
    return vjp(r)[0] * 0.25


dt = time_chained(lambda c: restrict(_prolong(c)) * sc, uc,
                  iters=100, warm=10)
log(f"P->R pair 512c      : {dt*1e6:7.1f} us")

# conv transfers: prolong = conv_transpose with 1D [1,3] kernels per axis?
# cell-centered bilinear prolongation as one NHWC conv_transpose stride 2
# kernel 2x2? weights (9,3,3,1)/16 pattern -> use kernel 4x4? Here: probe a
# depthwise 2-tap per-axis version via conv_general_dilated lhs_dilation.
kp = jnp.asarray([1.0, 3.0, 3.0, 1.0], jnp.float32) * 0.25


def prolong_conv(x):
    # per-axis: lhs_dilation=2 + SAME-ish padding reproduces the clamped
    # stencil only in the interior; ends differ (clamp) — timing probe.
    w = kp.reshape(4, 1, 1, 1)
    y = lax.conv_general_dilated(
        x[None, :, :, None], w, (1, 1), [(2, 1), (1, 1)],
        lhs_dilation=(2, 1), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    w2 = kp.reshape(1, 4, 1, 1)
    y = lax.conv_general_dilated(
        y, w2, (1, 1), [(1, 1), (2, 1)],
        lhs_dilation=(1, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[0, :, :, 0]


try:
    p = prolong_conv(uc)
    log(f"prolong_conv shape {p.shape}")
    def restrict_conv(r):
        zc = jnp.zeros((r.shape[0] // 2, r.shape[1] // 2), r.dtype)
        _, vjp = jax.vjp(prolong_conv, zc)
        return vjp(r)[0] * 0.25
    dt = time_chained(lambda c: restrict_conv(prolong_conv(c)) * sc, uc,
                      iters=100, warm=10)
    log(f"P->R pair conv 512c : {dt*1e6:7.1f} us")
except Exception as e:
    log(f"prolong_conv failed: {type(e).__name__}: {e}")

# --- full V-cycle apply (shape-preserving on flat vectors) ---------------
bflat = u.reshape(-1)
M = mg_preconditioner((g, g))
dt = time_chained(lambda c: M(c) * sc, bflat, iters=30, warm=3)
log(f"vcycle apply (pad)  : {dt*1e6:7.1f} us")

# per-level cost: time truncated hierarchies by raising `coarsest`
for coarsest in (512, 256, 64, 8):
    Mk = mg_preconditioner((g, g), coarsest=coarsest)
    dt = time_chained(lambda c: Mk(c) * sc, bflat, iters=30, warm=3)
    log(f"vcycle coarsest={coarsest:4d}: {dt*1e6:7.1f} us")
