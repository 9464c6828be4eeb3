"""Command-line benchmark driver.

Reference parity: ``main.cpp`` (`/root/reference/main.cpp:18-126`) — load a
MatrixMarket file, sweep all formats, print the ``### <FMT> <MODE> GFLOPS``
protocol lines.  Upgrades over the reference's positional-argv config
(SURVEY.md §5 "Config / flag system"): a real argparse CLI with format
selection, dtype policy, iteration count, synthetic-matrix generation (no
network egress needed), and an actually-enforced correctness gate.

Usage::

    python -m tpu_spmv matrix.mtx                    # sweep all formats
    python -m tpu_spmv --synthetic laplacian:512     # 512x512-grid Poisson
    python -m tpu_spmv matrix.mtx --formats csr,ell --dtype float32
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _parse_synthetic(spec: str):
    """``name:arg1[,arg2...]`` → scipy matrix via tpu_spmv.utils."""
    from . import utils

    name, _, argstr = spec.partition(":")
    args = [int(a) for a in argstr.split(",")] if argstr else []
    gens = {
        "laplacian": lambda n=256, m=None: utils.laplacian_2d(n, m),
        "laplacian3d": lambda n=32, m=None, k=None: utils.laplacian_3d(
            n, m, k),
        "random": lambda n=4096, m=None, d=None: utils.random_sparse(
            n, m or n, (d or 10) / 1000.0
        ),
        "banded": lambda n=65536, b=5: utils.banded(n, b),
        "powerlaw": lambda n=65536, k=8: utils.power_law(n, n, k),
    }
    if name not in gens:
        raise SystemExit(f"unknown synthetic matrix {name!r}; valid: {sorted(gens)}")
    return gens[name](*args)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tpu_spmv",
        description="TPU-native SpMV benchmark (arm-spmv capability parity)",
    )
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("matrix", nargs="?", help="MatrixMarket .mtx[.gz] file")
    src.add_argument(
        "--synthetic", metavar="SPEC",
        help="generate a matrix: laplacian:N | laplacian3d:N "
             "| random:N[,M,density_permille] "
             "| banded:N[,bw] | powerlaw:N[,avg_nnz]",
    )
    p.add_argument("--formats", default="coo,csr,csc,ell,dia,bsr",
                   help="comma-separated format list")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "float64", "bfloat16"],
                   help="compute dtype (float64 enables JAX x64 mode)")
    p.add_argument("--iters", type=int, default=50,
                   help="timed iterations per format (reference NUM_TEST=50)")
    p.add_argument("--no-check", action="store_true",
                   help="skip the correctness gate (reference behavior, Q1)")
    p.add_argument("--pallas", action="store_true",
                   help="use hand-tiled Pallas kernels where available")
    p.add_argument("--auto", action="store_true",
                   help="let the strategy planner pick the execution format")
    p.add_argument("--spmm", type=int, metavar="NRHS", default=0,
                   help="also benchmark SpMM with NRHS right-hand sides")
    p.add_argument("--dist", type=int, metavar="NDEV", default=0,
                   help="also benchmark the planned distributed SpMV over "
                        "an NDEV-device mesh (requires NDEV <= available "
                        "devices; square matrices only)")
    p.add_argument("--dist-strategy", default=None,
                   choices=["dia", "dia_stream", "pdia_stream", "bdia",
                            "gpr", "csr_halo", "csr_neighbor",
                            "csr_allgather"],
                   help="force the distributed strategy (default: the "
                        "planner's cost-model pick)")
    p.add_argument("--cache", metavar="DIR", default=None,
                   help="with --auto: cache the packed/converted matrix in "
                        "DIR so a second run on the same input skips "
                        "analysis and packing entirely")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="capture a jax.profiler trace of the sweep into DIR "
                        "(view with TensorBoard/Perfetto)")
    p.add_argument("--solve",
                   choices=["cg", "pcg", "chebcg", "mgpcg", "ir",
                            "bicgstab", "gmres", "power", "lanczos",
                            "sor"],
                   default=None,
                   help="run a solver on the matrix (cg / Jacobi-pcg / "
                        "Chebyshev-polynomial-pcg need SPD; ir = "
                        "mixed-precision iterative refinement, bf16-data "
                        "inner CG + f32 true residual; bicgstab / "
                        "gmres handle general square matrices; power = "
                        "dominant eigenpair; lanczos = both spectrum "
                        "ends of a symmetric matrix; sor = multicolor "
                        "Gauss-Seidel relaxation) on a synthetic "
                        "side and report iterations + residual + wall "
                        "time")
    p.add_argument("--tol", type=float, default=1e-6,
                   help="solver convergence tolerance (with --solve)")
    p.add_argument("--solve-nrhs", type=int, metavar="K", default=0,
                   help="with --solve cg: solve K right-hand sides at "
                        "once through the strategy's SpMM kernel "
                        "(k lockstep CG recurrences per MXU/stream "
                        "batched product — far cheaper than K separate "
                        "solves)")
    p.add_argument("--inner-iters", type=int, default=100,
                   help="with --solve ir: bf16 inner-CG steps per "
                        "refinement cycle (more = fewer f32 residual "
                        "recomputes, but a restart discards the Krylov "
                        "history each cycle)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json", action="store_true",
                   help="emit one JSON line per result instead of text")
    return p


#: cap on a dense-expanding format's projected STORAGE in the sweep.
#: ELL width = max row nnz and DIA stores every occupied diagonal whole,
#: so a power-law matrix expands 1000x+ (powerlaw:65536,16 hits ELL width
#: ~7.7k).  The cap is 1 GiB — far below the 16 GB HBM — because the
#: kernels' intermediates amplify storage further: XLA tiles the minor
#: dimension to 128 lanes, so an ELL SpMM at nrhs=4 materializes
#: [nrow*width, 4] as [nrow*width, 128] physically (measured: a 3.8 GiB
#: ELL pack compiled to a 259 GB allocation and killed the sweep).
_DENSE_CAP_BYTES = 1 << 30


def _drop_explosive_formats(formats, host_mat, itemsize):
    """Filter sweep formats whose dense expansion cannot fit on device.

    The reference would happily construct these and OOM/thrash
    (`/root/reference/src/matrix.cpp:450-500` allocates nrow*width with no
    bound); skipping with a message is the deliberate fix."""
    nrow, _ = host_mat.shape
    nnz = host_mat.nnz
    if nnz == 0:
        return formats
    row = np.asarray(host_mat.row, dtype=np.int64)
    col = np.asarray(host_mat.col, dtype=np.int64)
    keep = []
    for name in formats:
        est = None
        if name == "ell":
            width = int(np.bincount(row, minlength=nrow).max())
            est = nrow * width * (itemsize + 4)      # data + int32 col idx
        elif name == "dia":
            ndiags = len(np.unique(col - row))
            est = ndiags * nrow * itemsize
        if est is not None and est > _DENSE_CAP_BYTES:
            print(f"tpu_spmv: skipping {name.upper()} — dense expansion "
                  f"needs ~{est / 2**30:.1f} GiB on device "
                  f"(cap {_DENSE_CAP_BYTES >> 30} GiB; nnz={nnz}, "
                  f"{est / max(nnz * itemsize, 1):.0f}x the nonzeros)",
                  file=sys.stderr)
            continue
        keep.append(name)
    return keep


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from . import COO, read_matrix
    from .bench import bench_format_sweep

    dtype = dict(float32=jnp.float32, float64=jnp.float64,
                 bfloat16=jnp.bfloat16)[args.dtype]

    import scipy.sparse as sp

    if args.synthetic:
        host_mat = _parse_synthetic(args.synthetic).tocoo()
    else:
        from .io.mmio import read_mtx_arrays

        try:
            row, col, val, shape = read_mtx_arrays(args.matrix)
        except FileNotFoundError:
            raise SystemExit(f"tpu_spmv: matrix file not found: {args.matrix}")
        except ValueError as e:
            raise SystemExit(f"tpu_spmv: cannot read {args.matrix}: {e}")
        host_mat = sp.coo_matrix((val, (row, col)), shape=shape)
    coo = COO.from_arrays(host_mat.row, host_mat.col, host_mat.data,
                          host_mat.shape, dtype=dtype)
    src = args.synthetic and f"synthetic {args.synthetic}" or args.matrix
    print(f"{src}: shape={coo.shape} nnz={coo.nnz}")

    rng = np.random.default_rng(args.seed)
    x = jnp.asarray(rng.random(coo.shape[1]), dtype=dtype)

    device = jax.devices()[0]
    mode = "TPU" if "TPU" in getattr(device, "device_kind", "") else "CPU"
    formats = [f.strip().lower() for f in args.formats.split(",") if f.strip()]
    from .formats import FORMATS

    unknown = [f for f in formats if f not in FORMATS]
    if unknown:
        raise SystemExit(
            f"tpu_spmv: unknown format(s) {unknown}; valid: {sorted(FORMATS)}"
        )
    formats = _drop_explosive_formats(formats, host_mat,
                                      np.dtype(dtype).itemsize)

    import contextlib

    profile_ctx = (
        jax.profiler.trace(args.profile) if args.profile
        else contextlib.nullcontext()
    )
    with profile_ctx:
        return _run_benchmarks(args, coo, host_mat, x, formats, mode, dtype,
                               rng)


def _run_benchmarks(args, coo, host_mat, x, formats, mode, dtype, rng) -> int:
    import jax
    import jax.numpy as jnp
    import json

    if args.auto:
        from .bench import bench_spmv
        from .ops.auto import plan_from_matrix, plan_spmv

        plan = None
        cache_file = None
        if args.cache:
            import hashlib
            import os

            src = args.synthetic or os.path.abspath(args.matrix)
            if args.matrix:
                src += f":{os.path.getmtime(args.matrix)}"
            key = hashlib.sha1(f"{src}|{args.dtype}".encode()).hexdigest()[:16]
            os.makedirs(args.cache, exist_ok=True)
            cache_file = os.path.join(args.cache, f"plan_{key}.npz")
            if os.path.exists(cache_file):
                from .io.checkpoint import load_matrix

                try:
                    A, extra = load_matrix(cache_file, with_extra=True)
                    plan = plan_from_matrix(A, extra["strategy"])
                    if not args.json:
                        print(f"planner: reloaded {extra['strategy']} pack "
                              f"from {cache_file} (no re-analysis)")
                except (ValueError, KeyError, TypeError) as e:
                    # stale checkpoint (e.g. written by an older pack
                    # layout): fall back to re-planning + overwrite
                    if not args.json:
                        print(f"planner: cache stale ({e}); re-packing")
                    plan = None
        if plan is None:
            # plan from the host-side matrix: packing stays off-device.
            # --pallas forces the Pallas tier on (CPU defaults it off),
            # same as the sweep path (r5 fix: --auto used to ignore it)
            plan = plan_spmv(host_mat, dtype=dtype,
                             use_pallas=args.pallas or None)
            if cache_file:
                from .io.checkpoint import save_matrix

                save_matrix(cache_file, plan.matrix,
                            extra={"strategy": plan.strategy})
                if not args.json:
                    print(f"planner: cached pack to {cache_file}")
        if not args.json:
            print(f"planner: strategy={plan.strategy}")
        results = [bench_spmv(plan.matrix, x, mode=f"{mode}-AUTO",
                              iters=args.iters, check=not args.no_check,
                              quiet=args.json, spmv_fn=plan._kernel,
                              oracle=host_mat)]
    elif args.pallas:
        from .kernels import bench_pallas_sweep

        results = bench_pallas_sweep(coo, x, formats=formats,
                                     iters=args.iters,
                                     check=not args.no_check,
                                     quiet=args.json)
    else:
        from .bench import bench_format_sweep

        results = bench_format_sweep(coo, x, formats=formats, mode=mode,
                                     iters=args.iters,
                                     check=not args.no_check,
                                     quiet=args.json)

    if args.spmm > 0:
        from .bench.harness import bench_spmm
        from .formats import convert as _convert

        X = jnp.asarray(rng.random((coo.shape[1], args.spmm)), dtype=dtype)
        if args.auto:
            # the planner's native SpMM kernel (streaming-DIA / batched
            # GPR / PSELL sweep depending on strategy)
            line = bench_spmm(plan.matrix, X, iters=max(args.iters // 5, 3),
                              check=not args.no_check, quiet=args.json,
                              spmm_fn=lambda A_, V: plan.spmm(V),
                              oracle=host_mat)
            if args.json:
                results.append(line)
        for name in formats:
            A = _convert(coo, name)
            line = bench_spmm(A, X, iters=max(args.iters // 5, 3),
                              check=not args.no_check, quiet=args.json,
                              oracle=host_mat)
            if args.json:
                results.append(line)

    if args.dist > 0:
        from .dist import make_mesh
        from .dist.planned import bench_dist_spmv

        mesh = make_mesh(args.dist)
        line = bench_dist_spmv(host_mat, mesh, dtype=dtype,
                               iters=args.iters, check=not args.no_check,
                               quiet=args.json,
                               strategy=args.dist_strategy)
        if args.json:
            results.append(line)

    if args.solve is not None:
        import time as _time

        import numpy as _np

        from .ops.auto import plan_spmv
        from .solvers import bicgstab, cg, gmres, power_iteration

        if coo.shape[0] != coo.shape[1]:
            print("error: --solve needs a square matrix", file=sys.stderr)
            return 2
        # reuse the --auto plan (possibly cache-loaded) instead of paying
        # analysis + packing a second time; the SpmvPlan itself is the
        # matvec — packed strategies (GPR/PSELL/SDIA) don't flow through
        # the basic-format spmv dispatcher
        solve_plan = (plan if args.auto
                      else plan_spmv(host_mat, dtype=dtype,
                                     use_pallas=args.pallas or None))
        matvec = solve_plan
        t0 = _time.time()
        if args.solve == "power":
            lam, v = power_iteration(matvec, n=coo.shape[0], iters=200)
            jax.block_until_ready(v)
            line = {"solver": "power", "eigenvalue": float(lam),
                    "wall_s": round(_time.time() - t0, 3)}
            msg = (f"    power-iteration: lambda_max = {float(lam):.6g} "
                   f"({line['wall_s']}s)")
        elif args.solve == "lanczos":
            from .solvers import eigsh_lanczos

            lmin, lmax = eigsh_lanczos(matvec, k=80, n=coo.shape[0],
                                       full_reorth=True)
            line = {"solver": "lanczos", "eigenvalue_min": lmin,
                    "eigenvalue_max": lmax,
                    "wall_s": round(_time.time() - t0, 3)}
            msg = (f"    lanczos(k=80): spectrum in [{lmin:.6g}, "
                   f"{lmax:.6g}] ({line['wall_s']}s)")
        elif args.solve == "cg" and args.solve_nrhs > 1:
            from .solvers import cg_multi

            rng_b = _np.random.default_rng(args.seed + 1)
            B = jnp.asarray(rng_b.random((coo.shape[0], args.solve_nrhs)),
                            dtype=dtype)
            mres = cg_multi(solve_plan, B, tol=args.tol, maxiter=10_000)
            jax.block_until_ready(mres.x)
            rels = (_np.asarray(mres.residual_norm)
                    / _np.linalg.norm(_np.asarray(B), axis=0))
            line = {"solver": "cg", "strategy": solve_plan.strategy,
                    "nrhs": args.solve_nrhs,
                    "iterations": int(mres.iterations),
                    "rel_residual_max": float(rels.max()),
                    "converged": bool(_np.asarray(mres.converged).all()),
                    "wall_s": round(_time.time() - t0, 3)}
            msg = (f"    CG x{args.solve_nrhs} ({solve_plan.strategy}): "
                   f"{line['iterations']} iters, max rel residual "
                   f"{rels.max():.2e}, converged={line['converged']} "
                   f"({line['wall_s']}s)")
        else:
            rng_b = _np.random.default_rng(args.seed + 1)
            b = jnp.asarray(rng_b.random(coo.shape[0]), dtype=dtype)
            precond = None
            if args.solve == "mgpcg":
                # geometric multigrid: grid operators only — recover the
                # grid shape from the synthetic spec
                from .solvers import mg_preconditioner

                spec = args.synthetic or ""
                name, _, argstr = spec.partition(":")
                dims = [int(a) for a in argstr.split(",") if a] or []
                if name == "laplacian":
                    gx = dims[0] if dims else 256
                    gy = dims[1] if len(dims) > 1 else gx
                    shape = (gx, gy)
                elif name == "laplacian3d":
                    gx = dims[0] if dims else 32
                    gy = dims[1] if len(dims) > 1 else gx
                    gz = dims[2] if len(dims) > 2 else gy
                    shape = (gx, gy, gz)
                else:
                    raise SystemExit(
                        "tpu_spmv: --solve mgpcg needs a grid operator "
                        "(--synthetic laplacian:N / laplacian3d:N); for "
                        "general SPD matrices use pcg/chebcg")
                precond = mg_preconditioner(shape)
            if args.solve in ("pcg", "chebcg"):
                # Jacobi from the HOST diagonal: packed strategy formats
                # don't support the convert() the format-based helper uses
                from .solvers.cg import safe_dinv

                inv = safe_dinv(
                    np.asarray(host_mat.diagonal(), dtype=np.float64),
                    dtype)
                if args.solve == "chebcg":
                    from .solvers import chebyshev_preconditioner

                    precond = chebyshev_preconditioner(
                        matvec, dinv=inv, n=coo.shape[0])
                else:
                    precond = lambda r: inv * r
            if args.solve == "bicgstab":
                res = bicgstab(matvec, b, tol=args.tol, maxiter=10_000,
                               precond=precond)
            elif args.solve == "gmres":
                res = gmres(matvec, b, tol=args.tol, maxiter=10_000,
                            precond=precond)
            elif args.solve == "sor":
                from .solvers import sor as _sor

                res = _sor(matvec, b, host_mat=host_mat.tocsr(),
                           tol=args.tol, maxiter=10_000)
            elif args.solve == "ir":
                from .solvers import CGResult as _CGR
                from .solvers import ir_solve

                # bf16-data inner plan of the SAME matrix: half the
                # matrix bytes per inner SpMV, f32 true residual outside.
                # The hi plan must actually BE >= f32 for "f32 true
                # residual" to hold — with --dtype bfloat16 solve_plan
                # inherits bf16, so rebuild the hi plan in f32 (and the
                # RHS with it) rather than silently refining to the
                # bf16 floor under an f32-accuracy banner.
                hi_plan = solve_plan
                if jnp.dtype(dtype).itemsize < 4:
                    print("    ir: --dtype is narrower than float32; "
                          "building the hi-precision residual plan in "
                          "float32 (bf16 stays on the inner solve)")
                    hi_plan = plan_spmv(host_mat, dtype=jnp.float32,
                                        use_pallas=args.pallas or None)
                    b = jnp.asarray(_np.asarray(b), dtype=jnp.float32)
                low_plan = plan_spmv(host_mat, dtype=jnp.bfloat16,
                                     use_pallas=args.pallas or None)
                irres = ir_solve(hi_plan, b, low=low_plan,
                                 inner_iters=args.inner_iters, maxiter=400,
                                 tol=args.tol)
                res = _CGR(x=irres.x, iterations=irres.outer_iterations,
                           residual_norm=irres.residual_norm,
                           converged=irres.converged)
            else:
                res = cg(matvec, b, tol=args.tol, maxiter=10_000,
                         precond=precond)
            jax.block_until_ready(res.x)
            rel = float(res.residual_norm / jnp.linalg.norm(b))
            line = {"solver": args.solve, "strategy": solve_plan.strategy,
                    "iterations": int(res.iterations),
                    "rel_residual": rel,
                    "converged": bool(res.converged),
                    "wall_s": round(_time.time() - t0, 3)}
            msg = (f"    {args.solve.upper()} ({solve_plan.strategy}): "
                   f"{line['iterations']} iters, rel residual {rel:.2e}, "
                   f"converged={line['converged']} ({line['wall_s']}s)")
        if args.json:
            results.append(line)
        else:
            print(msg)

    if args.json:
        for r in results:
            print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
