"""Probe: where does GPR pack wall time go ON CHIP (host routing vs
device transfer) — VERDICT r4 item 4 (pack cold-start >=2x).

Run alone: python tools/probe_pack_breakdown.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from tpu_spmv.kernels import gpr
from tpu_spmv.utils import power_law, random_sparse

# intercept jnp.asarray to time device transfers inside the pack
_orig_asarray = jnp.asarray
_xfer = {"s": 0.0, "bytes": 0, "n": 0}


def timed_asarray(a, *args, **kw):
    t0 = time.time()
    out = _orig_asarray(a, *args, **kw)
    out.block_until_ready() if hasattr(out, "block_until_ready") else None
    _xfer["s"] += time.time() - t0
    _xfer["n"] += 1
    try:
        _xfer["bytes"] += out.nbytes
    except Exception:
        pass
    return out


for name, mk in [
    ("uniform700k", lambda: random_sparse(100_000, 100_000, 7e-5, seed=2,
                                          dtype=np.float32).tocsr()),
    ("powerlaw5M", lambda: power_law(400_000, 400_000, avg_nnz_per_row=13,
                                     alpha=1.5, seed=6,
                                     dtype=np.float32).tocsr()),
]:
    m = mk()
    for trial in ("cold", "warm"):
        _xfer.update(s=0.0, bytes=0, n=0)
        jnp.asarray = timed_asarray
        gpr._jnp_asarray_patched = True
        t0 = time.time()
        gp = gpr.pack_gpr_chunked(m, dtype=np.float32)
        wall = time.time() - t0
        jnp.asarray = _orig_asarray
        print(f"{name} {trial}: wall {wall:.2f}s | device xfer "
              f"{_xfer['s']:.2f}s ({_xfer['n']} arrays, "
              f"{_xfer['bytes']/1e6:.1f} MB) | host "
              f"{wall - _xfer['s']:.2f}s", flush=True)
        del gp
print("OK", flush=True)
