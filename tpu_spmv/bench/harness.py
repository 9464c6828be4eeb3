"""Benchmark harness — the reference's measurement protocol, TPU-correct.

Reference parity: the driver's 50-iteration timed sweep + GFLOPS printout
(`/root/reference/main.cpp:54-101`) and the self-timing NUMA kernels
(`/root/reference/src/mat_vec.cpp:201-216` etc.).  The grep-able result-line
shape is kept **exactly** (``### <FMT> <MODE> GFLOPS = <value>``) so results
are comparable; deliberate fixes over the reference:

- timings are fenced with ``jax.block_until_ready`` (async dispatch would
  otherwise make TPU timings meaningless);
- the spurious ``+Δt/1000`` term of the reference's ms formula
  (`/root/reference/main.cpp:60`, SURVEY.md Q2) is dropped;
- correctness is actually checked (the reference computes a reference vector
  and never compares it — SURVEY.md Q1): every benchmarked kernel is gated
  against a float64 scipy oracle at BASELINE's 1e-10 relative error;
- a roofline fraction (achieved HBM bandwidth / speed of light) is reported
  alongside GFLOPS, since GFLOPS alone says nothing about SpMV quality.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..formats import COO, CSR, CSC, ELL, DIA, BSR, BDIA, convert, to_coo
from ..ops import spmv, spmm
from .roofline import Roofline, roofline

__all__ = ["TimingResult", "time_fn", "time_chained", "format_name",
           "bench_spmv", "bench_spmm", "bench_format_sweep",
           "verify_against_oracle", "square_pad"]

#: Number of timed iterations, matching the reference's NUM_TEST/NTESTS
#: (`/root/reference/main.cpp:16`, `/root/reference/src/mat_vec.cpp:201`).
DEFAULT_ITERS = 50

_NAMES = {COO: "COO", CSR: "CSR", CSC: "CSC", ELL: "ELL", DIA: "DIA",
          BSR: "BSR", BDIA: "BDIA"}


def format_name(A) -> str:
    name = _NAMES.get(type(A), type(A).__name__)
    return {"PackedELL": "PSELL", "GPCSR": "GPR",
            "GPCSRChunked": "GPR"}.get(name, name)


@dataclasses.dataclass(frozen=True)
class TimingResult:
    mean_s: float
    best_s: float
    iters: int


def time_chained(step_fn: Callable, v0, *, iters: int = 20,
                 warm: int = 2, operands: tuple = (),
                 max_iters: int = 25600) -> float:
    """Seconds per iteration of ``v' = step_fn(v)`` chained inside ONE jit.

    The only timing protocol that is honest on every backend: the K
    iterations form a single dependent chain inside one dispatched XLA
    computation (no per-call dispatch overhead, no async-dispatch holes —
    on some remote backends ``block_until_ready`` does not actually fence),
    and the measurement is ``(t(warm+iters) - t(warm)) / iters``, which
    cancels dispatch + readback + fixed overhead exactly.

    ``step_fn`` must be shape-preserving (e.g. a normalized SpMV step on a
    square matrix).  The loop-carried dependency also stops XLA hoisting
    the work out of the loop (loop-invariant code motion would otherwise
    turn a repeat-timing loop into a single call — the failure mode of the
    reference's naive 50x loop, `/root/reference/main.cpp:55-58`, which its
    compiler was simply not smart enough to exploit).

    ``operands`` threads loop-invariant values (e.g. the matrix) through
    as jit ARGUMENTS — ``step_fn(c, *operands)`` — instead of closure
    captures: captured arrays are baked into the compiled payload as
    constants, which breaks remote compilation past ~100 MB and skews
    what is measured.
    """

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(ops, v, k):
        return lax.fori_loop(0, k, lambda i, c: step_fn(c, *ops), v)

    def run_fenced(k):
        out = run(operands, v0, k)
        # scalar readback is the fence; block_until_ready is NOT trustworthy
        jnp.sum(jax.tree_util.tree_leaves(out)[0]).item()

    run_fenced(warm)          # compile short loop + warm the fence path
    run_fenced(warm + iters)  # compile long loop

    def best_of(k, repeats=3):
        # min over repeats: jitter on the ~ms dispatch floor would otherwise
        # leak straight into per-iter times for fast kernels
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            run_fenced(k)
            best = min(best, time.perf_counter() - t0)
        return best

    while True:
        t_small = best_of(warm)
        t_big = best_of(warm + iters)
        signal = t_big - t_small
        # the differenced signal must clearly beat the dispatch-noise floor
        # (small/fast kernels once measured "0 us -> absurd GFLOPS" here);
        # lengthen the chain until it does
        if signal > max(0.25 * t_small, 2e-3) or iters >= max_iters:
            return max(signal / iters, 1e-9)
        iters *= 4
        run_fenced(warm + iters)  # compile the longer loop


def time_chained_pingpong(step_fn: Callable, v0, *, iters: int = 20,
                          warm: int = 2, operands: tuple = (),
                          nbuf: int = 2) -> float:
    """Seconds per step of a DONATED-OUTPUT kernel chained zero-copy.

    ``step_fn(x, dead, *operands) -> y`` must write its result into the
    donated ``dead`` buffer (pallas ``input_output_aliases``; see
    ``kernels.dia_stream._dead_out``).  Plain :func:`time_chained` charges
    such kernels a full extra carry copy per iteration: an XLA while loop
    pins each carry component to a fixed buffer, so a fresh-allocation
    output is copied back into the carry slot (measured: 2x wall time on
    a 2.1 GB stream).  Here each fori step runs ``nbuf`` kernel
    applications rotating through ``nbuf`` buffers — application i writes
    into buffer (i+1) mod nbuf — so every value is produced directly in
    its home carry slot and the loop is copy-free.  Real chained
    workloads (power iteration, Chebyshev, fixed-point smoothers) get
    the same win by threading the dead buffer the same way.

    ``nbuf`` also controls the live working set (nbuf x sizeof(v0)):
    with 2 buffers of a VMEM-scale vector the compiler may legally pin
    one in VMEM (the donated buffer is ``memory_space=ANY``) and the
    measurement stops being HBM-streaming — great for solvers, wrong
    for a roofline claim.  Pass ``nbuf=4`` to force the working set past
    VMEM when an HBM-bound number is the point.
    """
    if nbuf < 2:
        raise ValueError("nbuf >= 2 (output cannot alias a read operand)")
    bufs = (v0,) + tuple(jax.tree_util.tree_map(jnp.zeros_like, v0)
                         for _ in range(nbuf - 1))

    def rotate_step(c, *ops):
        out = list(c)
        x = c[0]
        for i in range(nbuf):
            x = step_fn(x, c[(i + 1) % nbuf], *ops)
            out[(i + 1) % nbuf] = x
        return tuple(out)

    return time_chained(rotate_step, bufs, iters=iters, warm=warm,
                        operands=operands) / float(nbuf)


def time_fn(fn: Callable, *args, iters: int = DEFAULT_ITERS,
            warmup: int = 2) -> TimingResult:
    """Time ``fn(*args)``: compile/warm up, then mean + best of ``iters``.

    Per-call dispatch timing fenced with ``block_until_ready``.  NOTE: on
    tunneled/remote backends this fence can be a no-op — prefer
    :func:`time_chained` (used by :func:`bench_spmv` for square operands).
    """
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    return TimingResult(mean_s=float(arr.mean()), best_s=float(arr.min()),
                        iters=iters)


def square_pad(A):
    """Embed a rectangular operand in a square one with identical nnz.

    Chained timing needs a shape-preserving step; zero rows/columns are
    appended (no new nonzeros) so the per-iteration work — nnz products
    plus max(nrow, ncol)-sized streams — is a faithful proxy for the
    rectangular kernel.  Used wherever ``block_until_ready``-fenced
    per-call timing would otherwise be the only option (it does not fence
    on remote backends — see :func:`time_chained`).
    """
    nrow, ncol = A.shape
    if nrow == ncol:
        return A
    n = max(nrow, ncol)
    coo = to_coo(A)
    sq = COO.from_arrays(np.asarray(coo.row), np.asarray(coo.col),
                         np.asarray(coo.data), (n, n))
    kwargs = {"block_size": A.block_size} if hasattr(A, "block_size") else {}
    return convert(sq, type(A), **kwargs)


def verify_against_oracle(A, x, y, rtol: float = 1e-10,
                          oracle=None) -> float:
    """Max relative error of ``y`` vs float64 scipy ``A @ x``.

    Raises if above ``rtol`` — the check the reference driver omitted
    (SURVEY.md Q1).  For float32 kernels a looser gate applies (the 1e-10
    gate is a float64-semantics target; see BASELINE.md).  ``oracle`` may
    supply the scipy matrix directly (packed formats that don't expose
    ``to_coo``).
    """
    sp_mat = (oracle.tocsr() if oracle is not None
              else to_coo(A).to_scipy()).astype(np.float64)
    x64 = np.asarray(x, dtype=np.float64)
    y_ref = sp_mat @ x64
    y_np = np.asarray(y, dtype=np.float64)
    denom = max(float(np.max(np.abs(y_ref))), 1e-300)
    rel = float(np.max(np.abs(y_np - y_ref))) / denom
    # gate scales with the compute dtype's precision: f64 gets the BASELINE
    # 1e-10 target; bf16 SpMV carries ~1e-2 relative error by construction.
    # Read the dtype on host (jnp.asarray would downcast a host float64 y
    # to f32 when x64 mode is off, silently loosening the gate)
    dt = np.asarray(y).dtype
    if dt == np.float64:
        gate = rtol
    elif dt == jnp.bfloat16:
        gate = max(rtol, 2e-2)
    elif dt == np.float16:
        gate = max(rtol, 2e-3)
    else:
        gate = max(rtol, 2e-5)
    if rel > gate:
        raise AssertionError(
            f"{format_name(A)} SpMV verification failed: rel err {rel:.3e} "
            f"> {gate:.0e}"
        )
    return rel


def bench_spmv(A, x, *, mode: str = "TPU", iters: int = DEFAULT_ITERS,
               check: bool = True, quiet: bool = False,
               spmv_fn: Callable | None = None, oracle=None) -> dict:
    """Benchmark one format's SpMV; print the reference protocol line.

    Returns a dict with gflops / seconds / roofline fraction / rel error.
    ``oracle`` optionally supplies the host scipy matrix (required for
    packed formats without ``to_coo``).
    """
    base_fn = spmv_fn or spmv
    fn = jax.jit(base_fn)
    rel = (verify_against_oracle(A, x, fn(A, x), oracle=oracle)
           if check else float("nan"))
    nrow, ncol = A.shape
    # chained timing (see time_chained): iterate v' = (A v) / ||A||_inf
    # so the dependent chain stays bounded without a per-step reduction.
    # Rectangular operands are square-padded (same nnz) — per-call fencing
    # is not trustworthy on remote backends, so everything chains.  The
    # matrix rides as a jit ARGUMENT (operands=), never a closure.
    host = (oracle.tocsr() if oracle is not None else to_coo(A).to_scipy())
    inf_norm = float(np.abs(host).sum(axis=1).max())
    scale = np.asarray(1.0 / max(inf_norm, 1e-300), dtype=x.dtype)
    if nrow == ncol:
        sec = time_chained(lambda v, M: base_fn(M, v) * scale, x,
                           iters=iters, operands=(A,))
    else:
        try:
            A_sq = square_pad(A)
        except (TypeError, AttributeError):
            # packed plan matrices (GPCSR/SDIA...) cannot be re-embedded;
            # fall back to per-call fencing and say so — better a marked
            # dispatch-floor number than a crash
            if not quiet:
                print(f"    ({format_name(A)}: rectangular packed operand "
                      f"— per-call timing, may measure dispatch)")
            sec = time_fn(fn, A, x, iters=iters).best_s
            A_sq = None
        if A_sq is not None:
            n = A_sq.shape[0]
            x_sq = jnp.pad(x, (0, n - x.shape[0])) if x.shape[0] < n else x
            sec = time_chained(lambda v, M: base_fn(M, v) * scale, x_sq,
                               iters=iters, operands=(A_sq,))
    nnz = A.nnz if hasattr(A, "nnz") else to_coo(A).nnz
    rf: Roofline = roofline(A, sec, nnz=nnz, x_dtype=x.dtype)
    name = format_name(A)
    # small/fast kernels can complete inside the dispatch-time noise the
    # chained differencing cancels; a clamped-to-floor time means "too
    # fast to resolve at this size", not a real rate
    resolved = sec > 2e-9
    if not quiet:
        # the reference's grep-able protocol line (main.cpp:61 etc.)
        print(f"### {name} {mode} GFLOPS = {rf.gflops * 1:.5f}")
        note = "" if resolved else " (below timer resolution at this size)"
        print(f"    {name} {mode}: {rf.summary()} | rel_err={rel:.2e}{note}")
    return {
        "format": name,
        "mode": mode,
        "gflops": rf.gflops,
        "seconds": rf.seconds,
        "bytes": rf.bytes,
        "bw_gbps": rf.bw_gbps,
        "roofline_fraction": rf.fraction,
        "rel_err": rel,
        "iters": iters,
    }


def bench_spmm(A, X, *, iters: int = DEFAULT_ITERS, check: bool = True,
               quiet: bool = False, spmm_fn: Callable | None = None,
               oracle=None) -> dict:
    """Benchmark one format's SpMM (multi-RHS) with the chained protocol.

    The chained step is ``V' = (A V) / ||A||_inf`` on ``[n, nrhs]`` blocks
    (square-padded when rectangular) — never ``block_until_ready``-fenced
    per-call loops, which measure dispatch on this backend.
    """
    from ..ops import spmm as _spmm_default

    base_fn = spmm_fn or _spmm_default
    nrhs = int(X.shape[1])
    Y = jax.jit(base_fn)(A, X)
    rel = (verify_against_oracle(A, X, Y, oracle=oracle)
           if check else float("nan"))
    host = (oracle.tocsr() if oracle is not None else to_coo(A).to_scipy())
    inf_norm = float(np.abs(host).sum(axis=1).max())
    scale = np.asarray(1.0 / max(inf_norm, 1e-300), dtype=X.dtype)
    nrow, ncol = A.shape
    if nrow == ncol:
        A_sq = A
    else:
        try:
            A_sq = square_pad(A)
        except (TypeError, AttributeError):
            A_sq = None
    if A_sq is None:
        # rectangular packed operand: per-call fencing fallback (marked)
        if not quiet:
            print(f"    ({format_name(A)}: rectangular packed operand — "
                  f"per-call timing, may measure dispatch)")
        sec = time_fn(jax.jit(base_fn), A, X, iters=iters).best_s
    else:
        n = A_sq.shape[0]
        X_sq = (jnp.pad(X, ((0, n - X.shape[0]), (0, 0)))
                if X.shape[0] < n else X)
        sec = time_chained(lambda V, M: base_fn(M, V) * scale, X_sq,
                           iters=iters, operands=(A_sq,))
    nnz = A.nnz if hasattr(A, "nnz") else to_coo(A).nnz
    gflops = 2 * nnz * nrhs / sec / 1e9
    name = format_name(A)
    if not quiet:
        print(f"### {name} SPMM{nrhs} GFLOPS = {gflops:.5f}")
        t = (f"{sec * 1e3:.3f} ms" if sec >= 1e-4
             else f"{sec * 1e6:.2f} us")
        print(f"    {name} SPMM{nrhs}: {t}/iter | rel_err={rel:.2e}")
    return {
        "format": name,
        "mode": f"SPMM{nrhs}",
        "gflops": gflops,
        "seconds": sec,
        "rel_err": rel,
        "iters": iters,
    }


def bench_format_sweep(coo: COO, x, *, formats=("coo", "csr", "csc", "ell",
                                                "dia", "bsr"),
                       mode: str = "TPU", iters: int = DEFAULT_ITERS,
                       check: bool = True, quiet: bool = False) -> list[dict]:
    """The driver's per-format sweep (`/root/reference/main.cpp:54-101`)."""
    results = []
    for name in formats:
        A = convert(coo, name)
        results.append(
            bench_spmv(A, x, mode=mode, iters=iters, check=check, quiet=quiet)
        )
    return results
