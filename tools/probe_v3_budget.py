"""Why does engine-v3 fail at 700k-nnz packs? (round-4 probe)

Captures the exact ``perm`` + ``v3_meta`` the GPR packer hands to the
router for the bench matrices, then reports the single-level row-budget
accounting across the (r_p, qcap) grid — where the overflow is, how big
it is, and whether element-level slack could absorb it.

Host-only (numpy); forces CPU.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, "/root/repo")

from tpu_spmv.kernels import gpr, permute as _perm
from tpu_spmv.utils import random_sparse

Q = _perm.Q
TILE = _perm.TILE

captured = {}
orig_plan = _perm.plan_permutation
orig_auto = _perm.plan_permutation_auto


def spy_plan(perm, **kw):
    captured.setdefault("calls", []).append(
        dict(perm=np.asarray(perm).copy(), kw={k: v for k, v in kw.items()
                                               if k in ("qcap", "force_r_p",
                                                        "v3_strict")},
             v3=kw.get("v3_meta") is not None))
    return orig_plan(perm, **kw)


def budget(perm, r_p, qcap):
    perm = np.asarray(perm, np.int64)
    n = len(perm)
    idx = np.arange(n, dtype=np.int64)
    m = perm >= 0
    T = max(-(-n // r_p), 1)
    pair = (perm[m] // r_p) * T + idx[m] // r_p
    uniq, cnt = np.unique(pair, return_counts=True)
    rows = -(-cnt // qcap)
    send = np.bincount(uniq // T, weights=rows, minlength=T).astype(int)
    recv = np.bincount(uniq % T, weights=rows, minlength=T).astype(int)
    return T, send, recv, uniq, cnt


def analyze(name, perm):
    n = len(perm)
    nreal = int((perm >= 0).sum())
    print(f"\n=== {name}: n={n} real={nreal} ntiles@13312="
          f"{-(-n // 13312)}")
    for qcap in (128, 124, 120, 112, 96):
        feas = []
        for r_p in range(13312, 1023, -1024):
            T, send, recv, uniq, cnt = budget(perm, r_p, qcap)
            smax, rmax = send.max(), recv.max()
            if smax <= Q and rmax <= Q:
                feas.append((r_p, T, smax, rmax))
        if feas:
            r_p, T, smax, rmax = feas[0]
            print(f" qcap={qcap:3d}: FEASIBLE at r_p={r_p} (T={T}, "
                  f"send_max={smax}, recv_max={rmax}); "
                  f"{len(feas)} feasible fills")
        else:
            # report the best (minimum of max overflow) across fills
            best = None
            for r_p in range(13312, 1023, -1024):
                T, send, recv, uniq, cnt = budget(perm, r_p, qcap)
                over = max(send.max(), recv.max()) - Q
                novs = int((send > Q).sum() + (recv > Q).sum())
                if best is None or over < best[1]:
                    best = (r_p, over, novs, T, int(send.max()),
                            int(recv.max()))
            r_p, over, novs, T, smax, rmax = best
            print(f" qcap={qcap:3d}: infeasible everywhere; best r_p={r_p} "
                  f"(T={T}) overflow={over} rows on {novs} tiles "
                  f"(send_max={smax} recv_max={rmax})")


def capture_pack(label, mat, chunked=False):
    captured.clear()
    _perm.plan_permutation = spy_plan
    try:
        try:
            if chunked:
                gpr.pack_gpr_chunked(mat, dtype=np.float32)
            else:
                gpr.pack_gpr(mat, dtype=np.float32)
        except Exception as e:
            print(f"[{label}] pack raised: {type(e).__name__}: {e}")
    finally:
        _perm.plan_permutation = orig_plan
    calls = captured.get("calls", [])
    print(f"[{label}] plan_permutation called {len(calls)} times: "
          + ", ".join(f"n={len(c['perm'])} {c['kw']}" for c in calls))
    # analyze each v3-strict (payload) call
    for i, c in enumerate(calls):
        if c["kw"].get("v3_strict"):
            analyze(f"{label} call{i}", c["perm"])


if __name__ == "__main__":
    from tpu_spmv.utils import power_law

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "gpr"):
        n = 100_000
        mat = random_sparse(n, n, 7e-5, seed=2, dtype=np.float32)
        print(f"bench gpr matrix: {mat.nnz} nnz")
        capture_pack("gpr700k", mat.tocsr())
    if which in ("all", "pl"):
        n = 200_000
        pl = power_law(n, n, avg_nnz_per_row=8, alpha=1.5, seed=6,
                       dtype=np.float32)
        print(f"bench power-law matrix: {pl.nnz} nnz")
        capture_pack("powerlaw", pl.tocsr(), chunked=True)
