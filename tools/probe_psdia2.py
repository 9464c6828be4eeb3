"""On-chip probe 2: predicated-mask psdia, rb sweep."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from bench import build_poisson_dia_device, verify_stencil_big
    from tpu_spmv.bench.harness import time_chained
    from tpu_spmv.bench.roofline import spmv_bytes
    from tpu_spmv.kernels import dia_stream

    dev = jax.devices()[0]
    print(f"device={dev.device_kind}", flush=True)

    g = 4096
    A = build_poisson_dia_device(g, jnp.float32)
    n = g * g
    x = jax.random.uniform(jax.random.PRNGKey(1), (n,), jnp.float32)
    scale = np.float32(1.0 / 8.0)

    v = jnp.asarray(np.random.default_rng(0).random(1 << 26), jnp.float32)
    sol_dt = time_chained(lambda c: c * 1.0000001 + 1e-9, v, iters=20, warm=2)
    stream_gbps = 2 * v.size * 4 / sol_dt / 1e9
    print(f"stream roofline = {stream_gbps:.0f} GB/s", flush=True)
    del v

    first = True
    for rb in (65536, 131072):
        PS = dia_stream.pack_psdia(A, period=g, rb=rb, verify=first)
        first = False
        rel = verify_stencil_big(PS, x, g, spmv_fn=dia_stream.spmv_psdia)
        assert rel < 2e-5, rel
        xpp = dia_stream.pad_x(PS, x)
        dt = time_chained(
            lambda c, Ad: dia_stream.spmv_psdia_padded(Ad, c) * scale, xpp,
            iters=800, warm=20, operands=(PS,))
        bw = spmv_bytes(PS) / dt / 1e9
        print(f"psdia rb={rb}  {dt * 1e3:.3f} ms/iter  {bw:.0f} GB/s(model) "
              f" {2 * A.nnz / dt / 1e9:.0f} GFLOP/s  "
              f"frac={bw / stream_gbps:.3f}  rel={rel:.1e}", flush=True)


if __name__ == "__main__":
    main()
