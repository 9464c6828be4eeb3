import sys, dataclasses
sys.path.insert(0, ".")  # run from repo root
import jax, jax.numpy as jnp
import numpy as np
from bench import build_poisson_dia_device, GRID
from tpu_spmv.bench.harness import time_chained_pingpong
from tpu_spmv.kernels import dia_stream
from tpu_spmv.ops.spgemm import spgemm

A = build_poisson_dia_device(1024, jnp.float32)   # 1M rows to keep demo fast
n = A.shape[0]
A2 = spgemm(A, A)          # 13-diagonal A^2, assembled on device
print("A2 offsets:", A2.offsets, flush=True)
P = dia_stream.pack_sdia(A2)   # A^2 boundary rows break strict periodicity
x = jax.random.uniform(jax.random.PRNGKey(2), (n,), jnp.float32)
y = dia_stream.spmv_sdia(P, x)
# oracle: two applications of the 5-point stencil
u = x.reshape(1024, 1024)
def st(u):
    return (4*u - jnp.pad(u[:-1], ((1,0),(0,0))) - jnp.pad(u[1:], ((0,1),(0,0)))
            - jnp.pad(u[:, :-1], ((0,0),(1,0))) - jnp.pad(u[:, 1:], ((0,0),(0,1))))
ref = st(st(u)).reshape(-1)
rel = float(jnp.max(jnp.abs(y - ref)) / jnp.max(jnp.abs(ref)))
print(f"A^2 sdia vs double-stencil rel = {rel:.2e}", flush=True)
assert rel < 5e-5
Pc = dataclasses.replace(P, data=P.data * jnp.float32(1/64.))
xp = dia_stream.pad_x(P, x)
dt = time_chained_pingpong(
    lambda c, dead, Ad: dia_stream.spmv_sdia_padded(Ad, c, dead), xp,
    iters=400, warm=20, operands=(Pc,), nbuf=4)
gflops = 2 * A2.nnz / dt / 1e9
print(f"A^2 spmv: {dt*1e6:.0f} us ({gflops:.0f} GFLOP/s, 13 diagonals, "
      f"nnz={A2.nnz})", flush=True)
