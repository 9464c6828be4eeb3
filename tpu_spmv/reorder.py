"""Bandwidth-reducing row/column reordering (RCM).

No reference analog — the reference takes matrix ordering as-is.  On TPU
ordering is a first-class performance lever: the fast kernels (DIA's
shifted FMAs, the Pallas kernel's per-sublane segment locality) reward
**local** column patterns, and reverse Cuthill–McKee concentrates entries
near the diagonal for matrices with hidden mesh/graph structure.

:func:`rcm_plan` computes the permutation on the host (scipy);
:class:`ReorderedOperator` wraps a plan built on the permuted matrix and
transparently permutes ``x``/``y`` on device — the permutation vectors ride
along as device arrays, and the two gathers they cost are n-sized (cheap
next to nnz-sized work).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .formats import to_coo
from .formats.base import as_index_array

__all__ = ["rcm_permutation", "bandwidth", "ReorderedOperator", "reorder_plan"]


def bandwidth(mat) -> int:
    """Max |col - row| over stored entries (host-side)."""
    coo = to_coo(mat) if not hasattr(mat, "tocoo") else None
    if coo is not None:
        row, col = np.asarray(coo.row), np.asarray(coo.col)
    else:
        m = mat.tocoo()
        row, col = m.row, m.col
    if len(row) == 0:
        return 0
    return int(np.max(np.abs(col.astype(np.int64) - row.astype(np.int64))))


def rcm_permutation(mat) -> np.ndarray:
    """Reverse Cuthill–McKee ordering of ``A + A^T`` (square matrices)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    if hasattr(mat, "tocsr"):
        csr = mat.tocsr()
    else:
        csr = to_coo(mat).to_scipy().tocsr()
    if csr.shape[0] != csr.shape[1]:
        raise ValueError("RCM reordering requires a square matrix")
    sym = (csr + csr.T).tocsr()
    return np.asarray(reverse_cuthill_mckee(sym, symmetric_mode=True))


@dataclasses.dataclass(frozen=True)
class ReorderedOperator:
    """A plan on the RCM-permuted matrix plus the device-side permutation.

    ``y = P^T (A_p (P x))`` where ``A_p = P A P^T`` — callable like a plan.

    NOTE: calling this per-SpMV pays two n-sized gathers, and XLA's TPU
    gather is slow — for iterative work (CG, power iteration) permute the
    vectors ONCE and run entirely in permuted space via ``self.plan``,
    permuting only the final result back (``x_p = x[self.perm]``,
    ``y = y_p[self.inv_perm]``).  That is how the solvers use it.
    """

    plan: object                 # SpmvPlan on the permuted matrix
    perm: jax.Array              # [n] new-order -> old-order
    inv_perm: jax.Array          # [n] old-order -> new-order
    bandwidth_before: int
    bandwidth_after: int

    def __call__(self, x, y=None):
        xp = x[self.perm]
        yp = self.plan(xp)
        out = yp[self.inv_perm]
        return out if y is None else y + out

    @property
    def strategy(self) -> str:
        return f"rcm+{self.plan.strategy}"


def reorder_plan(mat, **plan_kwargs) -> ReorderedOperator:
    """RCM-reorder a square matrix, then :func:`~tpu_spmv.ops.auto.plan_spmv`
    the permuted matrix.  Unlocks DIA/local-kernel execution for matrices
    whose structure is hidden by their ordering."""
    from .ops.auto import plan_spmv

    if hasattr(mat, "tocsr"):
        sp_csr = mat.tocsr()
    else:
        sp_csr = to_coo(mat).to_scipy().tocsr()
    perm = rcm_permutation(sp_csr)
    permuted = sp_csr[perm][:, perm].tocsr()
    permuted.sort_indices()
    from .formats import COO

    plan = plan_spmv(COO.from_scipy(permuted, dtype=sp_csr.dtype),
                     **plan_kwargs)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return ReorderedOperator(
        plan=plan,
        perm=as_index_array(perm),
        inv_perm=as_index_array(inv),
        bandwidth_before=bandwidth(sp_csr),
        bandwidth_after=bandwidth(permuted),
    )
