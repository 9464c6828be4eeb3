"""Compute ops: SpMV / SpMM per format, BLAS-1 vector ops."""

from .spmv import (
    spmv, spmv_coo, spmv_csr, spmv_csc, spmv_ell, spmv_dia, spmv_bsr,
    spmv_bdia,
)
from .spmm import (
    spmm, spmm_coo, spmm_csr, spmm_csc, spmm_ell, spmm_dia, spmm_bsr,
    spmm_bdia,
)
from .auto import plan_spmv, analyze, SpmvPlan
from .transpose import transpose
from .shift import shift_diagonal
from .spgemm import spgemm, spgemm_csr
from .blas1 import (
    dot, axpby, axpy, add2scaled, fill, fill_random, scale, shift,
    norm2, check_vector, allclose,
)

__all__ = [
    "spmv", "spmv_coo", "spmv_csr", "spmv_csc", "spmv_ell", "spmv_dia",
    "spmv_bsr", "spmv_bdia",
    "spmm", "spmm_coo", "spmm_csr", "spmm_csc", "spmm_ell", "spmm_dia",
    "spmm_bsr", "spmm_bdia",
    "plan_spmv", "analyze", "SpmvPlan", "transpose",
    "shift_diagonal", "spgemm", "spgemm_csr",
    "dot", "axpby", "axpy", "add2scaled", "fill", "fill_random", "scale",
    "shift", "norm2", "check_vector", "allclose",
]
