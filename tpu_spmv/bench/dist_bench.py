"""Weak/strong-scaling benchmark for the distributed SpMV strategies.

BASELINE.json config 5: row-partitioned CSR SpMV, >10M nnz, N hosts,
overlapped halo exchange — target >=80% weak-scaling efficiency in nnz/s.
On a multi-chip/multi-host mesh this measures the real thing; on a single
chip (or the CPU test mesh) it validates the machinery and measures the
collective overhead floor.

Usage::

    python -m tpu_spmv.bench.dist_bench --grid 1024 --ndev 8 --strategy halo
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tpu_spmv.bench.dist_bench")
    p.add_argument("--grid", type=int, default=512,
                   help="NxN Poisson grid (n = grid^2 rows)")
    p.add_argument("--ndev", type=int, default=0,
                   help="devices to use (0 = all)")
    p.add_argument("--strategy", choices=["allgather", "halo", "both"],
                   default="both")
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--balance", choices=["nnz", "rows"], default="nnz")
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from .. import dist
    from ..formats import CSR
    from ..utils import laplacian_2d
    from .harness import time_chained

    ndev = args.ndev or len(jax.devices())
    mesh = dist.make_mesh(ndev)
    mat = laplacian_2d(args.grid)
    csr = CSR.from_scipy(mat.astype(np.float32))
    n, nnz = csr.shape[0], csr.nnz
    print(f"dist_bench: n={n} nnz={nnz} ndev={ndev} "
          f"devices={jax.devices()[0].device_kind}", file=sys.stderr)
    x = np.random.default_rng(0).random(n).astype(np.float32)
    scale = np.float32(1.0 / abs(mat).sum(axis=1).max())

    results = []
    strategies = (["allgather", "halo"] if args.strategy == "both"
                  else [args.strategy])
    for strat in strategies:
        if strat == "halo":
            A = dist.HaloCSR.build(csr, ndev, balance=args.balance,
                                   square=True)
            spmv = lambda v: dist.spmv_halo(mesh, A, v)
        else:
            A = dist.ShardedCSR.build(csr, ndev, balance=args.balance,
                                      square=True)
            spmv = lambda v: dist.spmv_allgather(mesh, A, v)
        A = dist.place(A, mesh)
        xs = dist.place(dist.ShardedVector.from_global(x, A.row_plan), mesh)

        # correctness first (the reference never checked — SURVEY.md Q1)
        y = spmv(xs).to_global()
        ref = mat @ x.astype(np.float64)
        rel = float(np.max(np.abs(y - ref)) / np.max(np.abs(ref)))
        assert rel < 2e-5, f"{strat}: rel err {rel}"

        def step(v):
            out = spmv(v)
            return dist.blas.scale(out, scale)

        sec = time_chained(step, xs, iters=args.iters)
        nnz_per_s = nnz / sec
        line = {
            "strategy": strat, "ndev": ndev, "n": n, "nnz": nnz,
            "us_per_spmv": round(sec * 1e6, 2),
            "gnnz_per_s": round(nnz_per_s / 1e9, 3),
            "gflops": round(2 * nnz / sec / 1e9, 3),
            "rel_err": rel,
        }
        results.append(line)
        if args.json:
            print(json.dumps(line))
        else:
            print(f"### CSR DIST-{strat.upper()} GFLOPS = "
                  f"{line['gflops']:.5f}")
            print(f"    {strat}: {line['us_per_spmv']} us/iter | "
                  f"{line['gnnz_per_s']} Gnnz/s | rel_err={rel:.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
