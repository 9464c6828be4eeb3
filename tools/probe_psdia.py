"""On-chip probe: periodic streaming DIA vs explicit streaming DIA.

Single chip process — run in background, output to a file:
    python tools/probe_psdia.py > /tmp/psdia_probe.txt 2>&1
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    from bench import build_poisson_dia_device, verify_stencil_big
    from tpu_spmv.bench.harness import time_chained
    from tpu_spmv.bench.roofline import spmv_bytes
    from tpu_spmv.kernels import dia_stream

    dev = jax.devices()[0]
    log(f"device={dev.device_kind} platform={dev.platform}")

    g = 4096
    A = build_poisson_dia_device(g, jnp.float32)
    n = g * g
    x = jax.random.uniform(jax.random.PRNGKey(1), (n,), jnp.float32)
    scale = np.float32(1.0 / 8.0)

    t0 = time.time()
    S = dia_stream.pack_sdia(A)
    PS = dia_stream.pack_psdia(A, period=g)   # device path, verified
    log(f"packs built+verified in {time.time() - t0:.1f}s "
        f"(sdia rb={S.rb}, psdia rb={PS.rb} pattern={PS.pattern.shape})")

    rel_s = verify_stencil_big(S, x, g, spmv_fn=dia_stream.spmv_sdia)
    rel_p = verify_stencil_big(PS, x, g, spmv_fn=dia_stream.spmv_psdia)
    log(f"stencil cross-check: sdia {rel_s:.2e}  psdia {rel_p:.2e}")
    assert rel_s < 2e-5 and rel_p < 2e-5

    # stream roofline
    v = jnp.asarray(np.random.default_rng(0).random(1 << 26), jnp.float32)
    sol_dt = time_chained(lambda c: c * 1.0000001 + 1e-9, v, iters=20, warm=2)
    stream_gbps = 2 * v.size * 4 / sol_dt / 1e9
    log(f"stream roofline = {stream_gbps:.0f} GB/s")
    del v

    xp = dia_stream.pad_x(S, x)
    dt_s = time_chained(
        lambda c, Ad: dia_stream.spmv_sdia_padded(Ad, c) * scale, xp,
        iters=400, warm=20, operands=(S,))
    log(f"sdia   {dt_s * 1e3:.3f} ms/iter  "
        f"{spmv_bytes(S) / dt_s / 1e9:.0f} GB/s(model)  "
        f"{2 * A.nnz / dt_s / 1e9:.0f} GFLOP/s")

    xpp = dia_stream.pad_x(PS, x)
    for it in (400, 1200):
        dt_p = time_chained(
            lambda c, Ad: dia_stream.spmv_psdia_padded(Ad, c) * scale, xpp,
            iters=it, warm=20, operands=(PS,))
        bw = spmv_bytes(PS) / dt_p / 1e9
        log(f"psdia  {dt_p * 1e3:.3f} ms/iter (iters={it})  "
            f"{bw:.0f} GB/s(model)  {2 * A.nnz / dt_p / 1e9:.0f} GFLOP/s  "
            f"frac={bw / stream_gbps:.3f}")

    # SpMM comparison at 32 RHS
    NRHS = 32
    S32 = dia_stream.pack_sdia(A, nrhs=NRHS)
    PS32 = dia_stream.pack_psdia(A, period=g, rb=S32.rb, verify=False)
    Xt = jax.random.uniform(jax.random.PRNGKey(7), (NRHS, S32.npad),
                            jnp.float32)
    Xt = Xt.at[:, :S32.L].set(0).at[:, S32.L + n:].set(0)
    y0 = dia_stream.spmv_sdia_padded(S32, Xt[0])
    Yt = dia_stream.spmm_psdia_padded_t(PS32, Xt)
    rel = float(jnp.max(jnp.abs(Yt[0] - y0)) / jnp.max(jnp.abs(y0)))
    log(f"spmm psdia vs sdia-spmv rel={rel:.2e}")
    assert rel < 2e-5
    dt_ms = time_chained(
        lambda C, Ad: dia_stream.spmm_sdia_padded_t(Ad, C) * scale, Xt,
        iters=40, warm=4, operands=(S32,))
    dt_mp = time_chained(
        lambda C, Ad: dia_stream.spmm_psdia_padded_t(Ad, C) * scale, Xt,
        iters=40, warm=4, operands=(PS32,))
    log(f"spmm32 sdia {dt_ms * 1e3:.2f} ms  psdia {dt_mp * 1e3:.2f} ms  "
        f"({2 * A.nnz * NRHS / dt_mp / 1e9:.0f} GFLOP/s)")


if __name__ == "__main__":
    main()
