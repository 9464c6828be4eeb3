"""On-chip probe: PSDIA SpMM as mapped 1-D SpMV passes vs the fat panel.

With no data stream, each SpMV pass costs x+y only (134 MB at 88%
efficiency) — 32 passes may beat one 55%-efficient [32, rb] panel.
"""

import sys

sys.path.insert(0, ".")

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def main():
    from bench import build_poisson_dia_device
    from tpu_spmv.bench.harness import time_chained
    from tpu_spmv.kernels import dia_stream

    g = 4096
    A = build_poisson_dia_device(g, jnp.float32)
    n = g * g
    scale = np.float32(1.0 / 8.0)
    NRHS = 32

    S32 = dia_stream.pack_sdia(A, nrhs=NRHS)
    PSfat = dia_stream.pack_psdia(A, period=g, rb=S32.rb, verify=False,
                                  nrhs=NRHS)
    PS1 = dia_stream.pack_psdia(A, period=g, verify=False)  # rb=131072
    print(f"fat rb={PSfat.rb}, spmv rb={PS1.rb}", flush=True)

    Xt = jax.random.uniform(jax.random.PRNGKey(7), (NRHS, S32.npad),
                            jnp.float32)
    Xt = Xt.at[:, :S32.L].set(0).at[:, S32.L + n:].set(0)
    # map operand in the PS1 padded space
    Xt1 = jax.random.uniform(jax.random.PRNGKey(7), (NRHS, PS1.npad),
                             jnp.float32)
    Xt1 = Xt1.at[:, :PS1.L].set(0).at[:, PS1.L + n:].set(0)

    @functools.partial(jax.jit, static_argnames=())
    def spmm_map1(M, X):
        return lax.map(lambda x: dia_stream.spmv_psdia_padded(M, x), X)

    @jax.jit
    def spmm_map4(M, X):
        X4 = X.reshape(NRHS // 4, 4, X.shape[1])
        return lax.map(lambda x: dia_stream.spmm_psdia_padded_t(M, x),
                       X4).reshape(NRHS, X.shape[1])

    y0 = dia_stream.spmv_sdia_padded(S32, Xt[0])
    y0_1 = dia_stream.spmv_psdia_padded(PS1, Xt1[0])

    Yt = dia_stream.spmm_psdia_padded_t(PSfat, Xt)
    rel = float(jnp.max(jnp.abs(Yt[0] - y0)) / jnp.max(jnp.abs(y0)))
    assert rel < 2e-5
    dt = time_chained(lambda C, M: dia_stream.spmm_psdia_padded_t(M, C)
                      * scale, Xt, iters=40, warm=4, operands=(PSfat,))
    print(f"panel32 {dt * 1e3:.2f} ms ({2 * A.nnz * NRHS / dt / 1e9:.0f} "
          f"GFLOP/s)", flush=True)

    for name, fn, M, X in (("map1 ", spmm_map1, PS1, Xt1),
                           ("map4 ", spmm_map4, PS1, Xt1)):
        Y = fn(M, X)
        rel = float(jnp.max(jnp.abs(Y[0] - y0_1))
                    / jnp.max(jnp.abs(y0_1)))
        assert rel < 2e-5, (name, rel)
        dt = time_chained(lambda C, Mi: fn(Mi, C) * scale, X,
                          iters=40, warm=4, operands=(M,))
        print(f"{name} {dt * 1e3:.2f} ms "
              f"({2 * A.nnz * NRHS / dt / 1e9:.0f} GFLOP/s)", flush=True)


if __name__ == "__main__":
    main()
