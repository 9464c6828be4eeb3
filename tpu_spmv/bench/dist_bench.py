"""Weak/strong-scaling benchmark for the distributed SpMV strategies.

BASELINE.json config 5: row-partitioned CSR SpMV, >10M nnz, N hosts,
overlapped halo exchange — target >=80% weak-scaling efficiency in nnz/s.
On a multi-chip/multi-host mesh this measures the real thing; on a single
chip (or the CPU test mesh) it validates the machinery and measures the
collective overhead floor.

Strategies: ``allgather`` (replicate x), ``neighbor`` (ship only the k
adjacent chunks — the overlapped-halo strategy done right), ``halo``
(the P-step ring; kept for the all-to-all regime and as the measured
record of why it loses on banded operators — padded-bucket work
inflation, see ``NeighborCSR``).  Every point also records the
``predict_dist_costs`` model's prediction for its strategy.

Usage::

    python -m tpu_spmv.bench.dist_bench --grid 1024 --ndev 8 --strategy both
    python -m tpu_spmv.bench.dist_bench --sweep --cpu 8 --out DIST.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

STRATS = ["allgather", "neighbor", "halo"]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tpu_spmv.bench.dist_bench")
    p.add_argument("--grid", type=int, default=512,
                   help="NxN Poisson grid (n = grid^2 rows)")
    p.add_argument("--ndev", type=int, default=0,
                   help="devices to use (0 = all)")
    p.add_argument("--strategy", choices=STRATS + ["both"], default="both")
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--balance", choices=["nnz", "rows"], default="nnz")
    p.add_argument("--json", action="store_true")
    p.add_argument("--sweep", action="store_true",
                   help="weak-scaling sweep: ndev in {1,2,4,8} with the "
                        "grid scaled to hold nnz/device constant; emits "
                        "{ndev, gnnz_per_s, efficiency_pct} per point "
                        "(BASELINE config 5's >=80% weak-scaling metric), "
                        "plus an unstructured power-law GPR point set and "
                        "solver legs")
    p.add_argument("--out", default=None, metavar="FILE",
                   help="with --sweep: also write the sweep JSON here")
    p.add_argument("--cpu", type=int, default=0, metavar="N",
                   help="force the CPU backend with N virtual devices "
                        "(must be first jax use in the process; the "
                        "virtual mesh validates machinery + measures "
                        "collective overhead, not real scaling)")
    args = p.parse_args(argv)

    if args.cpu:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count"
                        f"={args.cpu}").strip()
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from .. import dist
    from ..formats import CSR
    from ..utils import laplacian_2d, power_law
    from .harness import time_chained

    def bench_point(grid: int, ndev: int, strategies) -> list:
        mesh = dist.make_mesh(ndev)
        mat = laplacian_2d(grid)
        csr = CSR.from_scipy(mat.astype(np.float32))
        n, nnz = csr.shape[0], csr.nnz
        print(f"dist_bench: grid={grid} n={n} nnz={nnz} ndev={ndev} "
              f"devices={jax.devices()[0].device_kind}", file=sys.stderr)
        x = np.random.default_rng(0).random(n).astype(np.float32)
        scale = np.float32(1.0 / abs(mat).sum(axis=1).max())
        costs = dist.predict_dist_costs(mat.tocsr().astype(np.float32),
                                        ndev, square=True,
                                        balance=args.balance)
        out = []
        for strat in strategies:
            if strat == "halo":
                A = dist.HaloCSR.build(csr, ndev, balance=args.balance,
                                       square=True)
                spmv = lambda v: dist.spmv_halo(mesh, A, v)
            elif strat == "neighbor":
                A = dist.NeighborCSR.build(csr, ndev, balance=args.balance,
                                           square=True)
                spmv = lambda v: dist.spmv_neighbor(mesh, A, v)
            else:
                A = dist.ShardedCSR.build(csr, ndev, balance=args.balance,
                                          square=True)
                spmv = lambda v: dist.spmv_allgather(mesh, A, v)
            A = dist.place(A, mesh)
            xs = dist.place(dist.ShardedVector.from_global(x, A.row_plan),
                            mesh)

            # correctness first (the reference never checked — SURVEY Q1)
            y = spmv(xs).to_global()
            ref = mat @ x.astype(np.float64)
            rel = float(np.max(np.abs(y - ref)) / np.max(np.abs(ref)))
            assert rel < 2e-5, f"{strat}: rel err {rel}"

            def step(v):
                return dist.blas.scale(spmv(v), scale)

            sec = time_chained(step, xs, iters=args.iters)
            out.append({
                "strategy": strat, "ndev": ndev, "grid": grid,
                "n": n, "nnz": nnz,
                "us_per_spmv": round(sec * 1e6, 2),
                "gnnz_per_s": round(nnz / sec / 1e9, 3),
                "gflops": round(2 * nnz / sec / 1e9, 3),
                "rel_err": rel,
                # the cost model's prediction for THIS strategy (chip
                # constants; on the virtual mesh it is a shape check of
                # the relative ordering, not an absolute match)
                "model_predicted_us": costs["csr_" + strat][
                    "predicted_us"],
            })
        return out

    strategies = (STRATS if args.strategy == "both" else [args.strategy])
    nall = len(jax.devices())

    if args.sweep:
        # weak scaling: nnz/device held ~constant (nnz ~ 5 grid^2, so
        # grid scales by sqrt(ndev)); efficiency is per-device throughput
        # relative to the ndev=1 point of the SAME strategy
        ndevs = [d for d in (1, 2, 4, 8) if d <= nall]
        sweep = {s: [] for s in strategies}
        for d in ndevs:
            grid_d = int(round(args.grid * d ** 0.5))
            for line in bench_point(grid_d, d, strategies):
                sweep[line["strategy"]].append(line)
        virtual = jax.devices()[0].platform == "cpu"
        report = {"mode": "weak_scaling", "base_grid": args.grid,
                  "device_kind": jax.devices()[0].device_kind,
                  "virtual_mesh": virtual,
                  "model_pick": dist.predict_dist_costs(
                      laplacian_2d(args.grid).tocsr().astype(np.float32),
                      max(ndevs), square=True)["pick"],
                  "points": []}
        if virtual:
            report["note"] = (
                "virtual mesh: N 'devices' time-share one host CPU, so "
                "per-device throughput CANNOT scale — efficiency_pct "
                "here validates the sweep machinery and bounds the "
                "collective overhead only; the BASELINE >=80% gate "
                "applies to this same command on real multi-chip "
                "hardware (each point then runs on its own chip)")
        for s in strategies:
            base = sweep[s][0]
            base_per_dev = base["gnnz_per_s"] / base["ndev"]
            for line in sweep[s]:
                per_dev = line["gnnz_per_s"] / line["ndev"]
                line["efficiency_pct"] = round(
                    100.0 * per_dev / base_per_dev, 1)
                report["points"].append(line)
                print(f"    {s} ndev={line['ndev']} grid={line['grid']}: "
                      f"{line['gnnz_per_s']} Gnnz/s, "
                      f"{line['efficiency_pct']}% weak-scaling eff, "
                      f"model {line['model_predicted_us']} us",
                      file=sys.stderr)

        # ---- unstructured leg (VERDICT r4 item 2): power-law matrix
        # through the sharded-GPR local kernel at each ndev, rel-err
        # gated.  nnz/device held ~constant.  On the virtual mesh the
        # GPR Pallas pipeline runs in interpret mode — correctness and
        # machinery, not throughput (wall omitted there; on real chips
        # the same points time the compiled kernels).
        report["gpr_points"] = []
        base_rows = 24_000                 # ~13 nnz/row -> ~300k/device
        for d in ndevs:
            n_d = base_rows * d
            m = power_law(n_d, n_d, avg_nnz_per_row=13, alpha=1.5,
                          seed=7, dtype=np.float32).tocsr()
            mesh = dist.make_mesh(d)
            plan = dist.plan_dist_spmv(m, d, dtype=np.float32,
                                       strategy="gpr")
            xg = np.random.default_rng(1).random(n_d).astype(np.float32)
            xs = dist.place(plan.shard_x(xg, dtype=np.float32), mesh)
            M = dist.place(plan.matrix, mesh)
            import dataclasses as _dc

            y = _dc.replace(plan, matrix=M).spmv(mesh, xs)
            yg = plan.y_to_global(y)
            ref = m.astype(np.float64) @ xg.astype(np.float64)
            rel = float(np.max(np.abs(yg - ref)) / np.max(np.abs(ref)))
            pt = {"strategy": "gpr", "ndev": d, "n": n_d,
                  "nnz": int(m.nnz), "rel_err": rel,
                  "interpret": virtual}
            assert rel < 2e-5, pt
            if not virtual:
                scale = np.float32(1.0 / abs(m).sum(axis=1).max())

                def gstep(v, Mx=M, mesh=mesh):
                    return dist.blas.scale(
                        dist.spmv_gpr_sharded(mesh, Mx, v), scale)

                sec = time_chained(gstep, xs, iters=50)
                pt["us_per_spmv"] = round(sec * 1e6, 2)
                pt["gnnz_per_s"] = round(m.nnz / sec / 1e9, 3)
            report["gpr_points"].append(pt)
            print(f"    gpr ndev={d} n={n_d} nnz={m.nnz}: rel {rel:.1e}"
                  + (" (interpret)" if virtual else
                     f", {pt.get('us_per_spmv')} us"), file=sys.stderr)

        # ---- solver legs.  Timing note (ADVICE r4): single-call walls
        # are dispatch-floor-bound on chip and compile-polluted on the
        # virtual mesh, so the artifact records ITERATION COUNTS and
        # residuals only — the mesh-scaling evidence is that multigrid's
        # iteration count stays O(1) as the mesh grows.
        from ..solvers import dist_cg, dist_cg_ca, dist_mg_preconditioner

        report["solver_points"] = []
        for d in ndevs:
            gmg = int(round(args.grid * d ** 0.5))
            unit = 16 * d                  # row-divisible, MG-coarsenable
            gmg = max(gmg - gmg % unit, unit)
            mesh = dist.make_mesh(d)
            sp_ = laplacian_2d(gmg).astype(np.float32).tocsr()
            A = dist.place(dist.NeighborCSR.build(sp_, d, balance="rows",
                                                  square=True), mesh)
            bh = np.random.default_rng(5).standard_normal(
                gmg * gmg).astype(np.float32)
            bs = dist.place(
                dist.ShardedVector.from_global(bh, A.row_plan), mesh)
            M = dist_mg_preconditioner(mesh, (gmg, gmg))
            res = dist_cg(mesh, A, bs, tol=1e-5, maxiter=100, precond=M)
            x = res.x.to_global()
            rtrue = float(np.linalg.norm(bh - sp_ @ x)
                          / np.linalg.norm(bh))
            # per-APPLY cost (one V-cycle + one halo matvec) via the
            # chained-differenced protocol — the quotable per-iteration
            # figure (single-call solve walls are dispatch-floor-bound
            # on chip and compile-polluted here, ADVICE r4)
            def apply_step(v, Ax=A, Mx=M, mesh=mesh):
                return dist.spmv_neighbor(mesh, Ax, Mx(v))

            apply_s = time_chained(apply_step, bs, iters=20)
            pt = {"solver": "dist_mgpcg", "ndev": d, "grid": gmg,
                  "n": gmg * gmg, "iterations": int(res.iterations),
                  "converged": bool(res.converged),
                  "true_rel_residual": rtrue,
                  "per_apply_us": round(apply_s * 1e6, 1)}
            assert pt["converged"] and rtrue < 1e-4, pt
            report["solver_points"].append(pt)
            print(f"    dist_mgpcg ndev={d} grid={gmg}: "
                  f"{pt['iterations']} iters, true rel {rtrue:.1e}",
                  file=sys.stderr)

        # unstructured solver leg (VERDICT r4 item 2): Jacobi-
        # preconditioned single-reduction CG on a NON-grid SPD operator
        # (random symmetric diagonally-dominant pattern), all shards
        d = max(ndevs)
        mesh = dist.make_mesh(d)
        import scipy.sparse as sp

        nu = 4096 * d
        R = sp.random(nu, nu, density=12.0 / nu, random_state=9,
                      format="csr", dtype=np.float64)
        S = (R + R.T) * 0.5
        Au = (S + sp.diags(np.abs(S).sum(axis=1).A1 + 1.0)).tocsr()
        Au32 = Au.astype(np.float32)
        Ad = dist.place(dist.NeighborCSR.build(Au32, d, square=True), mesh)
        bh = np.random.default_rng(11).standard_normal(nu).astype(
            np.float32)
        bs = dist.place(dist.ShardedVector.from_global(bh, Ad.row_plan),
                        mesh)
        dinv = (1.0 / Au.diagonal()).astype(np.float32)
        ds = dist.place(dist.ShardedVector.from_global(dinv, Ad.row_plan),
                        mesh)

        def jacobi(r):
            return dist.ShardedVector(chunks=r.chunks * ds.chunks,
                                      starts=r.starts, length=r.length)

        res = dist_cg_ca(mesh, Ad, bs, tol=1e-6, maxiter=500,
                         precond=jacobi)
        xg = res.x.to_global()
        rtrue = float(np.linalg.norm(bh - Au32 @ xg) / np.linalg.norm(bh))
        upt = {"solver": "dist_cg_ca+jacobi", "operator": "random_spd",
               "ndev": d, "n": nu, "nnz": int(Au.nnz),
               "iterations": int(res.iterations),
               "converged": bool(res.converged),
               "true_rel_residual": rtrue}
        assert upt["converged"] and rtrue < 1e-4, upt
        report["solver_points"].append(upt)
        print(f"    dist_cg_ca+jacobi (random_spd) ndev={d} n={nu}: "
              f"{upt['iterations']} iters, true rel {rtrue:.1e}",
              file=sys.stderr)

        print(json.dumps(report))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(report, f, indent=1)
        return 0

    ndev = args.ndev or nall
    for line in bench_point(args.grid, ndev, strategies):
        if args.json:
            print(json.dumps(line))
        else:
            print(f"### CSR DIST-{line['strategy'].upper()} GFLOPS = "
                  f"{line['gflops']:.5f}")
            print(f"    {line['strategy']}: {line['us_per_spmv']} us/iter"
                  f" | {line['gnnz_per_s']} Gnnz/s | "
                  f"rel_err={line['rel_err']:.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
