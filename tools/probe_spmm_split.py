"""On-chip probe: 3-way column-split SpMM vs the full-window baseline."""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


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
    PS32 = dia_stream.pack_psdia(A, period=g, rb=S32.rb, verify=False,
                                 nrhs=NRHS)
    h = dia_stream._halo_size(S32.offsets, S32.rb)
    print(f"rb={S32.rb} h={h} split={'yes' if 2 * h < S32.rb else 'no'}",
          flush=True)
    Xt = jax.random.uniform(jax.random.PRNGKey(7), (NRHS, S32.npad),
                            jnp.float32)
    Xt = Xt.at[:, :S32.L].set(0).at[:, S32.L + n:].set(0)
    y0 = dia_stream.spmv_sdia_padded(S32, Xt[0])
    for name, M, fn in (("sdia ", S32, dia_stream.spmm_sdia_padded_t),
                        ("psdia", PS32, dia_stream.spmm_psdia_padded_t)):
        Yt = fn(M, Xt)
        rel = float(jnp.max(jnp.abs(Yt[0] - y0)) / jnp.max(jnp.abs(y0)))
        assert rel < 2e-5, (name, rel)
        dt = time_chained(lambda C, Ad: fn(Ad, C) * scale, Xt,
                          iters=40, warm=4, operands=(M,))
        print(f"spmm32 {name} {dt * 1e3:.2f} ms "
              f"({2 * A.nnz * NRHS / dt / 1e9:.0f} GFLOP/s) rel={rel:.1e}",
              flush=True)


if __name__ == "__main__":
    main()
