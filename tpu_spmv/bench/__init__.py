"""Benchmarking: reference GFLOPS protocol + HBM roofline model."""

from .harness import (
    TimingResult, time_fn, format_name, bench_spmv, bench_format_sweep,
    verify_against_oracle, DEFAULT_ITERS,
)
from .roofline import Roofline, roofline, spmv_bytes, hbm_bandwidth_gbps

__all__ = [
    "TimingResult", "time_fn", "format_name", "bench_spmv",
    "bench_format_sweep", "verify_against_oracle", "DEFAULT_ITERS",
    "Roofline", "roofline", "spmv_bytes", "hbm_bandwidth_gbps",
]
