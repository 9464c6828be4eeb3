"""Sparse × sparse product (SpGEMM) for diagonal-structured operators.

General SpGEMM is a hash/merge problem with data-dependent output
structure — hostile to static-shape compilation.  But for DIA operands
the product's structure is KNOWN: a matrix with diagonals ``o1`` times
one with diagonals ``o2`` has diagonals ``o1 + o2``, and each output
diagonal is a sum of elementwise products of shifted input diagonals::

    C[i, i+o1+o2] = sum_{o1, o2} A.data[o1][i] * B.data[o2][i + o1]

so the whole product is ``ndiags(A) * ndiags(B)`` shifted FMAs over
``[nrow]`` vectors — exactly the compute shape the DIA SpMV kernels use,
static shapes throughout, one device pass, no gathers.  Out-of-range
shifted reads multiply structural zeros (the DIA convention), so no
masking is needed beyond zero-fill shifts.

This is what operator ASSEMBLY needs on TPU: ``spgemm(A, A)`` builds
``A²`` for squared/polynomial preconditioners, and composed with
:func:`~tpu_spmv.ops.shift.shift_diagonal` it assembles
``(A + aI)(A + bI)`` factors without ever leaving the device.  The
result is a plain :class:`~tpu_spmv.formats.dia.DIA` — it flows into
``pack_sdia`` / ``pack_psdia`` / the planner like any other operand.

General formats raise with a pointer to scipy (a host-side product is
the honest answer for unstructured patterns at this repo's scale).
No reference counterpart (`/root/reference` has no matrix-matrix ops).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

import functools

from ..formats import DIA

__all__ = ["spgemm"]


@functools.partial(jax.jit, static_argnames=("offs_a", "offs_b", "sums"))
def _build(da, db, *, offs_a, offs_b, sums):
    """One fused pass computing every output diagonal.  Module-level and
    keyed on the STATIC structure so repeated assemblies (polynomial
    factor chains) hit the jit cache instead of retracing per call."""
    pos = {o: k for k, o in enumerate(sums)}
    out = [jnp.zeros(da.shape[1:], jnp.result_type(da.dtype, db.dtype))
           for _ in sums]
    for i1, o1 in enumerate(offs_a):
        for i2, o2 in enumerate(offs_b):
            oc = int(o1) + int(o2)
            if oc not in pos:
                continue
            # C.data[oc][i] += A.data[o1][i] * B.data[o2][i + o1]
            k = pos[oc]
            out[k] = out[k] + da[i1] * _shift_fill(db[i2], int(o1))
    return jnp.stack(out)


def _shift_fill(v: jax.Array, s: int) -> jax.Array:
    """``out[i] = v[i + s]`` with zero fill (no wraparound)."""
    n = v.shape[0]
    if s == 0:
        return v
    if s > 0:
        return jnp.pad(jax.lax.slice_in_dim(v, min(s, n), n), (0, min(s, n)))
    return jnp.pad(jax.lax.slice_in_dim(v, 0, max(n + s, 0)), (min(-s, n), 0))


def spgemm(A, B) -> DIA:
    """``C = A @ B`` for DIA operands (square, matching inner dim)."""
    if not (isinstance(A, DIA) and isinstance(B, DIA)):
        raise TypeError(
            f"spgemm is implemented for DIA x DIA (static diagonal "
            f"structure); got {type(A).__name__} x {type(B).__name__} — "
            f"for unstructured patterns compute in scipy and convert")
    if A.shape[1] != B.shape[0]:
        raise ValueError(f"inner dimensions differ: {A.shape} @ {B.shape}")
    if A.shape[0] != A.shape[1] or B.shape[0] != B.shape[1]:
        raise ValueError("DIA spgemm supports square operands "
                         f"(got {A.shape} @ {B.shape})")
    n = A.shape[0]

    # output diagonals: all pairwise sums, clipped to the valid range
    sums = tuple(sorted({int(o1) + int(o2)
                         for o1 in A.offsets for o2 in B.offsets
                         if -n < int(o1) + int(o2) < n}))
    out_dtype = jnp.result_type(A.data.dtype, B.data.dtype)
    if not sums:
        # structurally zero product (e.g. nilpotent shifts whose offsets
        # sum out of range): the empty-DIA convention is offsets=(0,)
        return DIA(data=jnp.zeros((1, n), out_dtype), offsets=(0,),
                   shape=(n, n), nnz=0)

    data = _build(A.data, B.data, offs_a=A.offsets, offs_b=B.offsets,
                  sums=sums)
    # nnz: structural in-range count per diagonal — a cheap host-side
    # upper bound on true nonzeros (an exact count would block on a
    # device reduction mid-assembly; nnz only feeds GFLOPS accounting)
    nnz = int(sum(n - abs(o) for o in sums))
    return DIA(data=data, offsets=sums, shape=(n, n), nnz=nnz)
