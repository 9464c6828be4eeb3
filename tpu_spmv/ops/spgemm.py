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

General (unstructured) patterns go through :func:`spgemm_csr`: a HOST
symbolic phase (the Gustavson pair expansion and output-pattern dedup —
pure numpy, the same planner-side split every packed kernel here uses)
and a DEVICE numeric phase (gather-multiply-segment-sum over the
pre-sorted pair arrays, one jitted pass).  The split matters on TPU
twice over: the symbolic phase is data-dependent control flow XLA cannot
compile, and once it is host-side the numeric phase is static-shape and
re-runnable — same-structure re-products (iterated A·(A·x) assembly,
learned values) hit the jit cache with zero host work.

No reference counterpart (`/root/reference` has no matrix-matrix ops).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

import functools

from ..formats import CSR, DIA

__all__ = ["spgemm", "spgemm_csr"]


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


@functools.partial(jax.jit, static_argnames=("nnz_c",))
def _csr_numeric(adata, bdata, pa, pb, seg, nnz_c):
    """Device numeric phase: multiply the expanded pairs, segment-sum
    into the (pre-sorted, deduped) output slots."""
    prod = jnp.take(adata, pa) * jnp.take(bdata, pb)
    return jax.ops.segment_sum(prod, seg, num_segments=nnz_c,
                               indices_are_sorted=True)


def spgemm_csr(A, B, *, dtype=None, max_pairs: int = 200_000_000) -> CSR:
    """``C = A @ B`` for GENERAL sparse operands: host symbolic +
    device numeric (see module docstring).

    ``A``/``B`` are scipy sparse matrices or :class:`~tpu_spmv.formats`
    instances (device formats pull their index arrays back to host ONCE
    for the symbolic phase — prefer passing the scipy originals in cold
    paths).  Returns a device :class:`CSR`.

    ``max_pairs`` bounds the Gustavson expansion (= multiply FLOPs and
    the device scratch): dense-ish products are refused rather than
    OOMed, the same guard policy as the CLI's dense-expansion cap.
    """
    import scipy.sparse as sp

    def to_scipy(M):
        if sp.issparse(M):
            return M.tocsr()
        if hasattr(M, "to_scipy"):
            return M.to_scipy().tocsr()
        from ..formats import to_coo

        return to_coo(M).to_scipy().tocsr()

    As, Bs = to_scipy(A), to_scipy(B)
    if As.shape[1] != Bs.shape[0]:
        raise ValueError(f"inner dimensions differ: {As.shape} @ {Bs.shape}")
    As.sort_indices()
    Bs.sort_indices()
    if dtype is None:
        dtype = np.result_type(As.data.dtype, Bs.data.dtype)
    nrow, ncol = As.shape[0], Bs.shape[1]
    a_ind = np.asarray(As.indices, np.int64)
    b_ptr = np.asarray(Bs.indptr, np.int64)

    # ---- host symbolic: Gustavson pair expansion -------------------------
    counts = b_ptr[a_ind + 1] - b_ptr[a_ind]      # B-row length per A-nnz
    total = int(counts.sum())
    if total == 0:
        z = jnp.zeros(0, dtype)
        zi = jnp.zeros(0, jnp.int32)
        return CSR(data=z, indices=zi,
                   indptr=jnp.zeros(nrow + 1, jnp.int32),
                   row_ids=zi, shape=(nrow, ncol))
    if total > max_pairs:
        raise ValueError(
            f"spgemm_csr expansion needs {total} multiply pairs "
            f"(> max_pairs={max_pairs}); the product is too dense for "
            f"the expanded formulation — compute in scipy instead")
    arow = np.repeat(np.arange(nrow, dtype=np.int64),
                     np.diff(np.asarray(As.indptr, np.int64)))
    pa = np.repeat(np.arange(As.nnz, dtype=np.int64), counts)
    cum = np.cumsum(counts) - counts
    offs = np.arange(total, dtype=np.int64) - np.repeat(cum, counts)
    pb = np.repeat(b_ptr[a_ind], counts) + offs
    ci = np.repeat(arow, counts)                  # output row per pair
    ck = np.asarray(Bs.indices, np.int64)[pb]     # output col per pair
    o = np.lexsort((ck, ci))
    ci, ck, pa, pb = ci[o], ck[o], pa[o], pb[o]
    newseg = np.ones(total, bool)
    newseg[1:] = (ci[1:] != ci[:-1]) | (ck[1:] != ck[:-1])
    seg = np.cumsum(newseg) - 1
    nnz_c = int(seg[-1]) + 1
    out_rows = ci[newseg]
    out_cols = ck[newseg].astype(np.int32)
    indptr = np.zeros(nrow + 1, np.int64)
    np.cumsum(np.bincount(out_rows, minlength=nrow), out=indptr[1:])

    # ---- device numeric --------------------------------------------------
    data = _csr_numeric(
        jnp.asarray(As.data, dtype), jnp.asarray(Bs.data, dtype),
        jnp.asarray(pa, jnp.int32) if As.nnz < 2**31 else jnp.asarray(pa),
        jnp.asarray(pb, jnp.int32) if Bs.nnz < 2**31 else jnp.asarray(pb),
        jnp.asarray(seg, jnp.int32), nnz_c)
    return CSR(data=data, indices=jnp.asarray(out_cols),
               indptr=jnp.asarray(indptr, jnp.int32),
               row_ids=jnp.asarray(out_rows, jnp.int32),
               shape=(int(nrow), int(ncol)))


def spgemm(A, B):
    """``C = A @ B`` — DIA×DIA via the structured diagonal assembly
    below; any other sparse pair routes to :func:`spgemm_csr` (host
    symbolic + device numeric)."""
    if not (isinstance(A, DIA) and isinstance(B, DIA)):
        return spgemm_csr(A, B)
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
