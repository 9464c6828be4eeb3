"""Hand-tiled Pallas TPU kernels — the framework's native tier.

These replace the reference's hand-written C++ kernels
(`/root/reference/src/mat_vec.cpp`) where XLA's default lowering leaves
large factors on the table.  Measured context (TPU v5e, f32):

- XLA irregular gather ≈ 0.13 Gval/s → XLA-level ELL/CSR SpMV crawls;
- Mosaic's lane-window ``dynamic_gather`` ≈ 6–14 Gval/s (50–100x), but is
  only reachable from Pallas — hence :mod:`ell_pallas`;
- DIA/BDIA need no Pallas at all: XLA already runs their static shifted
  FMAs at HBM speed-of-light.
"""

from .ell_pallas import PackedELL, pack_ell, spmv_pallas, supports
from .permute import (PermutationPlan, TwoLevelPlan, plan_permutation,
                      plan_permutation_two_level, plan_permutation_auto,
                      apply_permutation, plan_tile_permutation,
                      apply_tile_permutation)
from .gpr import GPCSR, pack_gpr, spmv_gpr
from .dia_stream import SDIA, pack_sdia, spmv_sdia

__all__ = ["PackedELL", "pack_ell", "spmv_pallas", "supports",
           "PermutationPlan", "TwoLevelPlan", "plan_permutation",
           "plan_permutation_two_level", "plan_permutation_auto",
           "apply_permutation",
           "plan_tile_permutation", "apply_tile_permutation",
           "GPCSR", "pack_gpr", "spmv_gpr",
           "SDIA", "pack_sdia", "spmv_sdia",
           "bench_pallas_sweep"]


def bench_pallas_sweep(coo, x, *, formats=("ell",), iters=50, check=True,
                       quiet=False):
    """Benchmark Pallas kernels (CLI ``--pallas``); mirrors
    :func:`tpu_spmv.bench.bench_spmv`'s protocol lines."""
    import jax
    import numpy as np

    from ..bench.harness import time_chained, verify_against_oracle
    from ..bench.roofline import roofline
    from ..formats import convert

    results = []
    for name in formats:
        if name != "ell":
            if not quiet:
                print(f"    (no pallas kernel for {name}; skipping)")
            continue
        # rectangular inputs are square-padded up front (same nnz): the
        # chained protocol needs a shape-preserving step, and per-call
        # fencing is not trustworthy on remote backends
        from ..bench.harness import square_pad

        ell = square_pad(convert(coo, "ell"))
        n = ell.shape[0]
        import jax.numpy as jnp

        xs = x if x.shape[0] == n else jnp.pad(x, (0, n - x.shape[0]))
        packed = pack_ell(ell)
        fn = lambda v: spmv_pallas(packed, v)
        rel = verify_against_oracle(ell, xs, fn(xs)) if check else float("nan")
        sp_mat = ell.to_coo().to_scipy()
        scale = np.asarray(1.0 / max(abs(sp_mat).sum(axis=1).max(), 1e-300),
                           dtype=x.dtype)
        sec = time_chained(lambda v: fn(v) * scale, xs, iters=iters)
        rf = roofline(ell, sec, nnz=packed.nnz, x_dtype=x.dtype)
        if not quiet:
            print(f"### ELL PALLAS GFLOPS = {rf.gflops:.5f}")
            print(f"    ELL PALLAS: {rf.summary()} | rel_err={rel:.2e}")
        results.append({
            "format": "ELL", "mode": "PALLAS", "gflops": rf.gflops,
            "seconds": rf.seconds, "bw_gbps": rf.bw_gbps,
            "roofline_fraction": rf.fraction, "rel_err": rel, "iters": iters,
        })
    return results
