"""Profile the COLD (first-in-process) GPR pack on chip, by tottime."""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

# simulate bench conditions: the process has already done device work
v = jnp.ones(1 << 20, jnp.float32)
float(jnp.sum(v))

from tpu_spmv.kernels import gpr
from tpu_spmv.utils import random_sparse

m = random_sparse(100_000, 100_000, 7e-5, seed=2, dtype=np.float32).tocsr()
pr = cProfile.Profile()
pr.enable()
t0 = time.time()
gp = gpr.pack_gpr_chunked(m, dtype=np.float32)
wall = time.time() - t0
pr.disable()
print(f"cold wall {wall:.2f}s", flush=True)
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(24)
print(s.getvalue()[:4500], flush=True)
t0 = time.time()
gp = gpr.pack_gpr_chunked(m, dtype=np.float32)
print(f"warm wall {time.time() - t0:.2f}s", flush=True)
