"""Memory-bandwidth roofline model for sparse kernels.

SpMV is memory-bound on every modern machine; the meaningful efficiency
metric is achieved bytes/s versus the chip's HBM bandwidth ("speed of
light"), not FLOP utilization.  BASELINE.json's per-chip target is ≥70% of
this roofline.  The reference has no such model — it prints raw GFLOPS only
(`/root/reference/main.cpp:60-61`).

Byte counts are the *minimum traffic* model: each matrix byte read once, x
read once, y written once.  Irregular gathers may re-read x lines, so real
kernels can exceed the model's byte count — the model is deliberately the
optimistic bound, making the reported fraction conservative.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

__all__ = ["hbm_bandwidth_gbps", "spmv_bytes", "Roofline", "roofline"]

#: Advertised HBM bandwidth per chip, GB/s.  Sources: public TPU specs
#: (v4: 1228, v5e: 819, v5p: 2765, v6e/Trillium: 1640).  CPU entry is a
#: placeholder so tests can run the same code path.
_HBM_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5": 2765.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
    "TPU7x": 7400.0,
    "cpu": 50.0,
}


def hbm_bandwidth_gbps(device=None) -> float:
    """Best-effort HBM bandwidth for ``device`` (default: first device)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu")
    for prefix, bw in _HBM_GBPS.items():
        if kind.startswith(prefix):
            return bw
    return _HBM_GBPS["cpu"]


def _itemsize(dtype) -> int:
    return np.dtype(dtype).itemsize


def spmv_bytes(A, x_dtype=None) -> int:
    """Minimum HBM traffic of one ``y = A @ x`` for any tpu_spmv format."""
    from ..formats import COO, CSR, CSC, ELL, DIA, BSR, BDIA

    val = _itemsize(A.dtype)
    xval = _itemsize(x_dtype or A.dtype)
    idx = 4  # int32
    nrow, ncol = A.shape
    vec = ncol * xval + nrow * xval  # x read + y write
    if isinstance(A, COO):
        return A.nnz * (val + 2 * idx) + vec
    if isinstance(A, CSR):
        return A.nnz * (val + 2 * idx) + (nrow + 1) * idx + vec
    if isinstance(A, CSC):
        return A.nnz * (val + 2 * idx) + (ncol + 1) * idx + vec
    if isinstance(A, ELL):
        return A.data.size * (val + idx) + vec
    if isinstance(A, DIA):
        return A.data.size * val + vec
    if isinstance(A, BSR):
        return A.data.size * val + A.nblocks * idx + vec
    if isinstance(A, BDIA):
        return A.data.size * val + vec
    from ..kernels.dia_stream import PSDIA, SDIA

    if isinstance(A, SDIA):
        return A.data.size * val + vec
    if isinstance(A, PSDIA):
        # the pattern block is fetched once and stays VMEM-resident: the
        # per-SpMV stream is x + y plus one pattern read
        return A.pattern.size * val + vec
    from ..kernels.ell_pallas import PackedELL

    if isinstance(A, PackedELL):
        idx_bytes = A.lidx.dtype.itemsize + A.rnd.dtype.itemsize
        return A.vals.size * (val + idx_bytes) + A.seg.size * 4 + vec
    from ..kernels.gpr import GPCSR, GPCSRChunked

    if isinstance(A, GPCSRChunked):
        total = sum(spmv_bytes(c, x_dtype) for c in A.chunks) + vec
        if A.fold is not None:
            # fold-owning packs keep the stage-1 planes ONLY in the fold
            # (per-chunk gseg/glidx/a2/a3 are zero-size stubs)
            total += sum(int(p.size) * p.dtype.itemsize
                         for p in (A.fold.gseg, A.fold.glidx,
                                   A.fold.a2, A.fold.a3))
        return total
    if isinstance(A, GPCSR):
        plane_bytes = sum(
            int(p.size) * p.dtype.itemsize
            for p in (A.plan.a1, A.plan.a2, A.plan.a3,
                      A.plan.b2, A.plan.b3)
        )
        total = (A.vals.size * val
                 + A.glidx.size * A.glidx.dtype.itemsize  # int8 lane ids
                 + A.gseg.size * 4 + plane_bytes
                 + A.vals.size * val)          # gathered+permuted temps
        if A.side_gpr is not None:
            total += spmv_bytes(A.side_gpr, x_dtype)
        return total + vec
    raise TypeError(f"unsupported sparse type {type(A).__name__}")


@dataclasses.dataclass(frozen=True)
class Roofline:
    """Achieved vs speed-of-light for one timed kernel."""

    seconds: float
    bytes: int
    flops: int
    bw_gbps: float            # achieved GB/s
    peak_gbps: float          # chip HBM speed of light
    fraction: float           # bw / peak  (the ≥0.70 gate)
    gflops: float

    def summary(self) -> str:
        return (
            f"{self.gflops:8.3f} GFLOP/s | {self.bw_gbps:8.2f} GB/s "
            f"| {100 * self.fraction:5.1f}% of {self.peak_gbps:.0f} GB/s roofline"
        )


def roofline(A, seconds: float, *, nnz: int | None = None, device=None,
             x_dtype=None) -> Roofline:
    """Build a :class:`Roofline` from one measured per-call time.

    FLOPs are ``2·nnz`` with *true* nnz — the reference over-credits padded
    ELL slots (`/root/reference/src/mat_vec.cpp:415`); we do not.
    """
    nnz = A.nnz if nnz is None else nnz
    nbytes = spmv_bytes(A, x_dtype)
    peak = hbm_bandwidth_gbps(device)
    bw = nbytes / seconds / 1e9
    return Roofline(
        seconds=seconds,
        bytes=nbytes,
        flops=2 * nnz,
        bw_gbps=bw,
        peak_gbps=peak,
        fraction=bw / peak,
        gflops=2 * nnz / seconds / 1e9,
    )
