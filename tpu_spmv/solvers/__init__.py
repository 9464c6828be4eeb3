"""Iterative solvers: the consumers of the BLAS-1 + SpMV surface that the
reference declares support for but never exercises (SURVEY.md §2.1 #10)."""

from .block_cg import CGMultiResult, cg_multi, cg_multi_runner
from .cg import (CGResult, cg, cg_runner, cg_runner_k,
                 jacobi_preconditioner, power_iteration)
from .cheby import ChebyshevResult, chebyshev, chebyshev_preconditioner
from .dist_cg import DistCGResult, dist_cg, dist_cg_ca
from .dist_gmres import DistGMRESResult, dist_gmres
from .ir import IRResult, ir_runner, ir_solve
from .krylov import KrylovResult, bicgstab, gmres
from .lanczos import LanczosResult, eigsh_lanczos, lanczos
from .lsqr import LSQRResult, lsqr
from .multigrid import mg_preconditioner, poisson_stencil_apply
from .dist_multigrid import dist_mg_preconditioner
from .dist_bicgstab import DistBiCGSTABResult, dist_bicgstab
from .relaxation import (SORResult, gauss_seidel_sweep, multicolor, sor,
                         symgs_preconditioner)

__all__ = ["CGResult", "cg", "cg_runner", "cg_runner_k",
           "jacobi_preconditioner",
           "power_iteration",
           "CGMultiResult", "cg_multi", "cg_multi_runner",
           "ChebyshevResult", "chebyshev", "chebyshev_preconditioner",
           "DistCGResult", "dist_cg", "dist_cg_ca",
           "DistGMRESResult", "dist_gmres",
           "IRResult", "ir_solve", "ir_runner",
           "KrylovResult", "bicgstab", "gmres",
           "LanczosResult", "lanczos", "eigsh_lanczos",
           "LSQRResult", "lsqr",
           "mg_preconditioner", "poisson_stencil_apply",
           "dist_mg_preconditioner",
           "DistBiCGSTABResult", "dist_bicgstab",
           "SORResult", "multicolor", "gauss_seidel_sweep", "sor",
           "symgs_preconditioner"]
