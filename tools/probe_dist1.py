"""Probe: sharded GPR + PSDIA local kernels Mosaic-COMPILED at ndev=1
on the real chip (VERDICT r4 item 1 pre-check before the bench legs).

Run: python tools/probe_dist1.py   (chip process — run alone)
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

t0 = time.time()
import jax
import jax.numpy as jnp

print(f"devices: {jax.devices()}", flush=True)

from tpu_spmv import dist
from tpu_spmv.bench.harness import time_chained, time_chained_pingpong
from tpu_spmv.kernels import dia_stream, gpr
from tpu_spmv.utils import laplacian_2d, random_sparse

# ---- GPR at ndev=1, compiled ----
n = 100_000
sp_mat = random_sparse(n, n, 7e-5, seed=2, dtype=np.float32).tocsr()
t = time.time()
Sg = dist.ShardedGPR.build(sp_mat, 1, dtype=np.float32)
print(f"ShardedGPR.build: {time.time()-t:.1f}s", flush=True)
mesh1 = dist.make_mesh(1)
rng = np.random.default_rng(3)
x = jnp.asarray(rng.random(n), jnp.float32)
xs = dist.place(dist.ShardedVector.from_global(np.asarray(x), Sg.x_plan),
                mesh1)
Sg = dist.place(Sg, mesh1)
t = time.time()
ys = dist.spmv_gpr_sharded(mesh1, Sg, xs)    # interpret=False
ys.chunks.block_until_ready()
print(f"spmv_gpr_sharded compiled+ran: {time.time()-t:.1f}s", flush=True)
local = jax.tree_util.tree_map(lambda l: l[0], Sg.gpcsr)
y_plain = gpr.spmv_gpr(local, x)
reld = float(jax.jit(lambda a, b: jnp.max(jnp.abs(a - b))
             / jnp.max(jnp.abs(b)))(ys.chunks[0][:n], y_plain))
print(f"gpr sharded-vs-plain rel: {reld:.3e}", flush=True)
assert reld < 1e-6, reld
ref = sp_mat.astype(np.float64) @ np.asarray(x, np.float64)
rel_o = float(np.max(np.abs(np.asarray(ys.chunks[0][:n], np.float64) - ref))
              / np.max(np.abs(ref)))
print(f"gpr sharded-vs-oracle rel: {rel_o:.3e}", flush=True)
assert rel_o < 2e-5, rel_o

scale = np.float32(1.0 / abs(sp_mat).sum(axis=1).max())


def dstep(v, M):
    return dist.blas.scale(dist.spmv_gpr_sharded(mesh1, M, v), scale)


ddt = time_chained(dstep, xs, iters=100, warm=10, operands=(Sg,))
pdt = time_chained(lambda c, M: gpr.spmv_gpr(M, c) * scale, x,
                   iters=100, warm=10, operands=(local,))
print(f"gpr dist1 {ddt*1e6:.0f} us vs plain-same-pack {pdt*1e6:.0f} us "
      f"-> parity {ddt/pdt:.2f}x", flush=True)

# ---- PSDIA at ndev=1, compiled (mid-size grid to keep probe fast) ----
G = 1024
m = laplacian_2d(G)
from tpu_spmv.formats import COO, convert

A = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
PS = dia_stream.pack_psdia(A, period=G)
xg = jnp.asarray(rng.random(G * G), jnp.float32)
xpp = dia_stream.pad_x(PS, xg)
Sp = dist.ShardedPSDIA.build(PS, 1)
xdp = Sp.shard_xpad(xpp)
t = time.time()
yd = dist.spmv_psdia_sharded(mesh1, Sp, xdp)   # interpret=False
yd.chunks.block_until_ready()
print(f"spmv_psdia_sharded compiled+ran: {time.time()-t:.1f}s", flush=True)
y_plain = dia_stream.spmv_psdia_padded(PS, xpp)
relp = float(jax.jit(lambda a, b: jnp.max(jnp.abs(a - b))
             / jnp.max(jnp.abs(b)))(yd.chunks[0][:PS.npad], y_plain))
print(f"psdia sharded-vs-plain rel: {relp:.3e}", flush=True)
assert relp < 1e-6, relp

sc = np.float32(1 / 8.0)
Sp_sc = dataclasses.replace(Sp, pattern=Sp.pattern * sc)
PSc = dataclasses.replace(PS, pattern=PS.pattern * sc)


def dist_step_p(vs, dead, Sd):
    return dist.spmv_psdia_sharded(mesh1, Sd, vs, dead=dead)


ddt_p = time_chained_pingpong(dist_step_p, xdp, iters=400, warm=20,
                              operands=(Sp_sc,))
pdt_p = time_chained_pingpong(
    lambda c, dead, Ad: dia_stream.spmv_psdia_padded(Ad, c, dead), xpp,
    iters=400, warm=20, operands=(PSc,))
print(f"psdia dist1 {ddt_p*1e6:.1f} us vs plain {pdt_p*1e6:.1f} us "
      f"-> parity {ddt_p/pdt_p:.2f}x", flush=True)
print(f"total {time.time()-t0:.0f}s OK", flush=True)
