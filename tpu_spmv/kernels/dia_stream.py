"""Streaming Pallas DIA SpMV — the HBM-bound large-matrix kernel.

The XLA lowering of the shifted-FMA DIA formulation (`ops/spmv.py`) runs at
HBM speed only while the working set is VMEM-resident; at 16.7M rows
(470 MB/iter) it measured **99 GB/s — 14% of the 693 GB/s chip roofline**
(BENCH_r02 investigation).  This kernel tiles the row space and streams
every operand once:

- grid over row tiles of ``RB`` rows; the diagonal data block
  ``[ndiags, RB]`` and the y tile are auto-pipelined by Pallas;
- x is passed THREE times with neighbor index maps (``j-1, j, j+1``) — an
  in-kernel halo window, so every diagonal becomes a *static slice* of
  ``[left | own | right]`` (the same trick as the distributed layer's ring
  halo, `dist/planned.py`), and Pallas double-buffers the fetches;
- all boundary handling is *data-driven*: the padded row space
  (front/back pads rounded to whole tiles) makes every clamped edge tile
  read garbage that multiplies structurally-zero diagonal data.

Envelope: ``max |offset| <= rb`` (auto-selected 16384..131072 per the
data-block VMEM budget — covers 5-point Poisson up to grid 131072) and
square matrices for the chained/padded layout.  Traffic per SpMV = ndiags·n (data) + 3n (x refetch) + n (y)
values; measured **~76% of the stream roofline** where the XLA form
managed 14%.

Reference parity: the DIA kernel loop `/root/reference/src/mat_vec.cpp:123-146`
(its bounds test per element is here a structural zero in the data).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.base import sparse_dataclass, static_field
from ..formats.dia import DIA

__all__ = ["SDIA", "pack_sdia", "spmv_sdia_padded", "spmv_sdia",
           "spmm_sdia_padded_t", "spmm_sdia", "supports_sdia",
           "PSDIA", "detect_period", "pack_psdia", "spmv_psdia_padded",
           "spmv_psdia", "spmm_psdia_padded_t", "spmm_psdia",
           "transpose_psdia", "transpose_sdia"]

#: floor rows per grid tile (multiple of 1024); :func:`pack_sdia` auto-
#: selects up to RB_MAX subject to the data-block VMEM budget — fatter
#: tiles cut grid-step fixed cost and halo refetch (measured on the
#: 16.7M-row Poisson operand: 0.822 -> 0.848 of stream roofline going
#: 16384 -> 65536)
RB = 16384
RB_MAX = 131072
#: per-buffer budget for the [ndiags, rb] data block (double-buffered)
_DATA_BLOCK_BUDGET = 3 << 20
#: scoped-VMEM budget (MB) for the multi-RHS kernels — module-level so
#: probes can sweep it
_SPMM_VMEM_MB = 64


def _dead_out(kernel, in_specs, operands, dead):
    """Augment a pallas call with a DONATED, never-read operand aliased to
    output 0 (``dead`` must match the output shape/dtype).

    Why this exists: an XLA while/fori loop pins each carry component to a
    fixed buffer, so a chained kernel whose output is a fresh allocation
    pays a full extra carry copy per iteration — measured 2x wall time on
    the 32-RHS SpMM (13.3 -> 6.9 ms) and on a raw 2.1 GB pallas copy
    (13.1 -> 6.5 ms).  Writing into a donated buffer the caller threads
    through the loop (even-odd ping-pong, see
    ``bench.harness.time_chained_pingpong``) elides the copy.  True
    in-place (aliasing an operand the stencil READS) would race with the
    pipelined halo fetches; a dead buffer cannot.
    """
    if dead is None:
        return kernel, in_specs, operands, {}

    def kernel_dead(*refs):
        kernel(*refs[:-2], refs[-1])

    any_space = getattr(pl, "ANY", None) or pltpu.ANY
    return (kernel_dead,
            in_specs + [pl.BlockSpec(memory_space=any_space)],
            operands + (dead,),
            {"input_output_aliases": {len(in_specs): 0}})


def _roundup(a: int, m: int) -> int:
    return -(-a // m) * m


@sparse_dataclass
class SDIA:
    """DIA matrix in padded-tile row space for the streaming kernel.

    ``data[d, k]`` is diagonal ``offsets[d]`` at *global* row ``k - L``
    (zero for pad rows and out-of-range slots).  ``L`` front-pad and the
    back pad are whole tiles, so tile 0 / the tail tiles are entirely
    structural zeros — that is what makes the kernel's edge-clamped x
    fetches harmless.
    """

    data: jax.Array                       # [ndiags, npad]
    offsets: tuple[int, ...] = static_field()
    shape: tuple[int, int] = static_field()
    nnz: int = static_field()
    L: int = static_field()               # front pad rows (multiple of RB)
    rb: int = static_field(default=RB)

    @property
    def npad(self) -> int:
        return int(self.data.shape[1])

    @property
    def ndiags(self) -> int:
        return int(self.data.shape[0])

    @property
    def dtype(self):
        return self.data.dtype


def _auto_rb(ndiags: int, offsets, nrow: int, nrhs: int = 1,
             itemsize: int = 4) -> int | None:
    """Pick the row-tile size: as fat as the data-block budget allows
    (fewer grid steps, smaller halo fraction), shrunk for small matrices
    (whole-tile padding), raised — within 2x budget — when the band needs
    it.  ``None`` = the band does not fit any feasible tile.

    ``nrhs > 1`` (the SpMM layout) makes the [nrhs, rb] X/Y panels the
    dominant VMEM tenants: cap ``nrhs·rb·4`` at ~8 MB — measured on the
    84M-nnz Poisson at nrhs=32: rb 4096 → 65536 takes the SpMM from
    19.5 → 13.7 ms (the h=4096 halo slivers stop tripling X traffic);
    rb=131072 fails to compile under the 64 MB scoped-vmem limit."""
    need = _roundup(max(max(abs(int(o)) for o in offsets), 1), 1024)
    rb = 65536
    while rb > RB and ndiags * rb * itemsize > _DATA_BLOCK_BUDGET:
        rb //= 2
    while rb > RB and rb >= 4 * nrow:
        rb //= 2
    # the [nrhs, rb] X/Y panels are in the X dtype (not the stored-data
    # dtype) — assume 4-byte vectors, the supported compute dtype
    while rb > 4096 and nrhs * rb * 4 > (8 << 20):
        rb //= 2
    if need > rb:
        rb = need
        if rb > RB_MAX or ndiags * rb * itemsize > 2 * _DATA_BLOCK_BUDGET:
            return None
    return rb


def supports_sdia(offsets, shape, rb: int | None = None, *,
                  itemsize: int = 4, nrhs: int = 1) -> bool:
    """Feasibility probe for :func:`pack_sdia` — MUST mirror its
    ``_auto_rb`` call (same itemsize) or the planner admits matrices the
    pack then rejects (code-review r3: f64 wide-band operands passed the
    itemsize=4 probe and raised out of plan_spmv)."""
    if shape[0] != shape[1]:
        return False
    if rb is None:
        return _auto_rb(len(offsets), offsets, shape[0], nrhs=nrhs,
                        itemsize=itemsize) is not None
    return max(abs(int(o)) for o in offsets) <= rb


def pack_sdia(dia: DIA, rb: int | None = None, *, nrhs: int = 1,
              data_dtype=None) -> SDIA:
    """Lay a DIA matrix out in padded-tile row space (device-side ops —
    no host round-trip, so packing a 335 MB operand costs one stream).

    ``rb=None`` auto-selects the tile size (see :func:`_auto_rb`); pass
    the intended ``nrhs`` when the pack will mostly serve
    :func:`spmm_sdia_padded_t` — the multi-RHS panels change the VMEM
    optimum.

    ``data_dtype`` (e.g. ``jnp.bfloat16``) stores the diagonal data in a
    narrower type while the kernels keep x/y and the accumulation in the
    x dtype — MIXED precision.  The data stream is the dominant HBM
    traffic of the explicit kernel (335 of 470 MB/iter on the 16.7M-row
    Poisson), so bf16 data buys ~1.8x on a streaming-bound SpMV at a
    ~1e-2 relative-error budget (bf16 has 8 mantissa bits; the products
    are computed in f32 after an in-VPU upconvert, so only the stored
    coefficients are rounded).  The TPU-idiomatic trade — the reference
    has no analog (double-only, ``src/mat_vec.cpp``)."""
    nrow, ncol = dia.shape
    if rb is None:
        isz = int(np.dtype(data_dtype).itemsize) if data_dtype is not None \
            else int(np.dtype(dia.data.dtype).itemsize)
        rb = _auto_rb(dia.ndiags, dia.offsets, nrow, nrhs=nrhs,
                      itemsize=isz)
    if rb is None or not supports_sdia(dia.offsets, dia.shape, rb):
        raise ValueError(
            f"sdia needs a square matrix with a feasible row tile "
            f"(max |offset| <= rb <= {RB_MAX}), got shape {dia.shape}, "
            f"offsets [{min(dia.offsets)}, {max(dia.offsets)}]"
        )
    lo = max(0, -min(dia.offsets))
    hi = max(0, max(dia.offsets))
    L = _roundup(lo, rb) if lo else 0
    U = _roundup(hi, rb) if hi else 0
    npad = L + _roundup(nrow, rb) + U
    data = jnp.pad(dia.data, ((0, 0), (L, npad - L - nrow)))
    if data_dtype is not None:
        data = data.astype(data_dtype)
    return SDIA(data=data, offsets=dia.offsets, shape=dia.shape,
                nnz=dia.nnz, L=L, rb=rb)


def _halo_size(offsets, rb: int) -> int:
    """Halo block size: the smallest power-of-two divisor of ``rb`` (>=
    1024 for lane-tile alignment) covering the widest offset — the
    neighbor refetch is then ``2H/RB`` of x instead of 2x."""
    need = max(max(abs(int(o)) for o in offsets), 1)
    h = min(1024, rb)
    while (h < need or rb % h) and h < rb:
        h *= 2
    return h if rb % h == 0 and h >= need else rb


def _kernel(data_ref, xm_ref, x0_ref, xp_ref, o_ref, *, offsets, rb, h):
    win = jnp.concatenate([xm_ref[:], x0_ref[:], xp_ref[:]])
    acc = data_ref[0] * jax.lax.slice_in_dim(win, h + offsets[0],
                                             h + offsets[0] + rb)
    for d, off in enumerate(offsets[1:], start=1):
        acc = acc + data_ref[d] * jax.lax.slice_in_dim(win, h + off,
                                                       h + off + rb)
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmv_sdia_padded(A: SDIA, xpad: jax.Array, dead: jax.Array | None = None,
                     *, interpret: bool = False) -> jax.Array:
    """``ypad = A @ xpad`` in padded row space (``[npad] -> [npad]``).

    Shape-preserving — chain it directly (``xpad[k] = x[k - L]``, pads
    stay zero because pad tiles have all-zero data).

    x rides in three aliased views: the own ``RB`` block plus two
    ``H``-sized neighbor slivers (H = smallest aligned block covering the
    band), so the refetch overhead is ``2H/RB`` instead of 2x.  Edge
    index clamps feed only pure-pad tiles (structurally zero data).

    ``dead``, if given, is a DONATED ``[npad]`` buffer the output is
    written into (never read) — the zero-copy hook for chained loops,
    see :func:`_dead_out`.
    """
    rb = A.rb
    npad = A.npad
    T = npad // rb
    nd = A.ndiags
    h = _halo_size(A.offsets, rb)
    hb = rb // h                     # halo blocks per row tile
    TH = npad // h

    kern, in_specs, ops, extra = _dead_out(
        functools.partial(_kernel, offsets=A.offsets, rb=rb, h=h),
        [
            pl.BlockSpec((nd, rb), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda j: (jnp.clip(j * hb - 1, 0, TH - 1),),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb,), lambda j: (j,), memory_space=pltpu.VMEM),
            pl.BlockSpec((h,),
                         lambda j: (jnp.clip((j + 1) * hb, 0, TH - 1),),
                         memory_space=pltpu.VMEM),
        ],
        (A.data, xpad, xpad, xpad), dead)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (npad,), jnp.result_type(A.data.dtype, xpad.dtype)),
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb,), lambda j: (j,),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **extra,
    )(*ops)


def _spmm_acc(coef, xm, x0, xp, offsets, rb, h):
    """Per-tile ``[nrhs, rb]`` diagonal accumulation, column-split 3 ways.

    Materializing the full ``[nrhs, rb + 2h]`` window costs an ~(rb+2h)·
    nrhs-value copy per tile (8.9 MB at rb=65536/nrhs=32).  Interior
    output columns ``[h, rb-h)`` only ever read inside the own block, so
    they use slices of the loaded x0 directly; the two h-wide edges use
    small ``[nrhs, 3h]`` windows.  Measured wall-time-neutral at nrhs=32
    on chip (the per-diagonal lane shifts dominate, not the window copy)
    but it cuts the scoped-VMEM temporaries ~4x — headroom for fatter
    tiles.  Returns (accL, accM, accR), or a single full-width acc when
    the tile is too thin to split (rb <= 2h).

    ``coef`` maps diagonal index -> its ``[rb]`` coefficient row.
    Mapped per-RHS SpMV passes were probed as an alternative SpMM
    formulation and lose badly (94.8 ms vs the panel's 13.5 at 32 RHS:
    scan's per-pass x-slice/y-update copies add ~200 MB per RHS).
    """
    if 2 * h >= rb:       # too thin to split (interior would be empty)
        win = jnp.concatenate([xm, x0, xp], axis=1)
        acc = coef(0)[None, :] * jax.lax.slice_in_dim(
            win, h + offsets[0], h + offsets[0] + rb, axis=1)
        for d, off in enumerate(offsets[1:], start=1):
            acc = acc + coef(d)[None, :] * jax.lax.slice_in_dim(
                win, h + off, h + off + rb, axis=1)
        return (acc,)
    winL = jnp.concatenate(
        [xm, jax.lax.slice_in_dim(x0, 0, 2 * h, axis=1)], axis=1)
    winR = jnp.concatenate(
        [jax.lax.slice_in_dim(x0, rb - 2 * h, rb, axis=1), xp], axis=1)
    accL = accM = accR = None
    for d, off in enumerate(offsets):
        # newaxis+slice in ONE indexing op lowers to an (unsupported)
        # Mosaic gather; expand first, then static-slice
        c = jnp.expand_dims(coef(d), 0)                       # [1, rb]
        tL = jax.lax.slice_in_dim(c, 0, h, axis=1) * \
            jax.lax.slice_in_dim(winL, h + off, 2 * h + off, axis=1)
        tM = jax.lax.slice_in_dim(c, h, rb - h, axis=1) * \
            jax.lax.slice_in_dim(x0, h + off, rb - h + off, axis=1)
        tR = jax.lax.slice_in_dim(c, rb - h, rb, axis=1) * \
            jax.lax.slice_in_dim(winR, h + off, 2 * h + off, axis=1)
        accL = tL if accL is None else accL + tL
        accM = tM if accM is None else accM + tM
        accR = tR if accR is None else accR + tR
    return (accL, accM, accR)


def _spmm_store(o_ref, pieces, rb, h):
    if len(pieces) == 1:
        o_ref[:] = pieces[0]
    else:
        accL, accM, accR = pieces
        o_ref[:, :h] = accL
        o_ref[:, h:rb - h] = accM
        o_ref[:, rb - h:] = accR


def _spmm_kernel(data_ref, xm_ref, x0_ref, xp_ref, o_ref, *, offsets, rb, h):
    pieces = _spmm_acc(lambda d: data_ref[d], xm_ref[:], x0_ref[:],
                       xp_ref[:], offsets, rb, h)
    _spmm_store(o_ref, pieces, rb, h)


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmm_sdia_padded_t(A: SDIA, Xt_pad: jax.Array,
                       dead: jax.Array | None = None, *,
                       interpret: bool = False) -> jax.Array:
    """``Yt_pad = (A @ Xt_pad.T).T`` for TRANSPOSED multi-RHS operands
    ``[nrhs, npad]``.

    The transposed layout is load-bearing, not cosmetic: a ``[n, nrhs]``
    array with ``nrhs < 128`` pads its lane dimension to 128 on TPU — a
    4x memory blow-up (8 GB for the 16.7M-row bench operand).  With rows
    on the lane dimension the layout is dense, and each diagonal is a
    lane-shifted slice of the ``[nrhs, rb + 2h]`` window (same static-
    slice structure as the SpMV kernel).  Shape-preserving — chainable;
    pass ``dead`` (donated ``[nrhs, npad]``) for zero-copy chaining
    (:func:`_dead_out`).
    """
    rb = A.rb
    npad = A.npad
    T = npad // rb
    nd = A.ndiags
    nrhs = int(Xt_pad.shape[0])
    h = _halo_size(A.offsets, rb)
    hb = rb // h
    TH = npad // h

    kern, in_specs, ops, extra = _dead_out(
        functools.partial(_spmm_kernel, offsets=A.offsets, rb=rb, h=h),
        [
            pl.BlockSpec((nd, rb), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nrhs, h),
                         lambda j: (0, jnp.clip(j * hb - 1, 0, TH - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nrhs, rb), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nrhs, h),
                         lambda j: (0, jnp.clip((j + 1) * hb, 0, TH - 1)),
                         memory_space=pltpu.VMEM),
        ],
        (A.data, Xt_pad, Xt_pad, Xt_pad), dead)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (nrhs, npad), jnp.result_type(A.data.dtype, Xt_pad.dtype)),
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nrhs, rb), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        # the multi-RHS window tips the default 16 MB scoped-vmem budget
        # (concat + per-diagonal slice temporaries); raise it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SPMM_VMEM_MB * 1024 * 1024),
        interpret=interpret,
        **extra,
    )(*ops)


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmm_sdia(A: SDIA, X: jax.Array, *, interpret: bool = False) -> jax.Array:
    """``A @ X`` with plain ``[n, nrhs]`` operands.

    Convenience wrapper: transposes in and out of the dense ``[nrhs, n]``
    kernel layout.  For very large ``n`` prefer building operands in
    transposed layout and calling :func:`spmm_sdia_padded_t` directly —
    the ``[n, nrhs]`` input itself carries the 4x lane-padding cost.
    """
    Xt = jnp.pad(X.T, ((0, 0), (A.L, A.npad - A.L - X.shape[0])))
    Yt = spmm_sdia_padded_t(A, Xt, interpret=interpret)
    return jax.lax.slice_in_dim(Yt, A.L, A.L + A.shape[0], axis=1).T


def pad_x(A: SDIA, x: jax.Array) -> jax.Array:
    return jnp.pad(x, (A.L, A.npad - A.L - x.shape[0]))


def unpad_y(A: SDIA, ypad: jax.Array) -> jax.Array:
    return jax.lax.slice_in_dim(ypad, A.L, A.L + A.shape[0])


def _place_shifted(v: jax.Array, s: int, npad_dst: int) -> jax.Array:
    """``out[k] = v[k - s]`` with exact zero fill (``out`` has
    ``npad_dst`` slots) — static pad + slice, no wraparound."""
    npad_src = int(v.shape[0])
    lo = max(0, s)
    hi = min(npad_dst, npad_src + s)
    if hi <= lo:
        return jnp.zeros((npad_dst,), v.dtype)
    seg = jax.lax.slice_in_dim(v, lo - s, hi - s)
    return jnp.pad(seg, (lo, npad_dst - hi))


def transpose_sdia(A: SDIA) -> SDIA:
    """``A^T`` as another streaming operator — per-diagonal zero-filled
    shifts of the (already padded) data block, one device stream.

    Derivation: ``A^T[i, i+o'] = A[i+o', i]`` with ``o' = -o``, so the
    transposed diagonal's value at global row ``i`` is ``data_o[i + o']``
    — in padded row space ``dataT[d', k] = data[d, k - s_d]`` with
    ``s_d = L_T - L + o``.  Out-of-range slots stay exactly zero (they
    map to structural zeros of ``data`` or to the zero fill), preserving
    the pad-tile invariant the kernel's clamped x fetches rely on.
    """
    nrow, ncol = A.shape
    offs_T = [-int(o) for o in A.offsets]
    order = sorted(range(len(offs_T)), key=lambda d: offs_T[d])
    lo_T = max(0, -min(offs_T))
    hi_T = max(0, max(offs_T))
    L_T = _roundup(lo_T, A.rb) if lo_T else 0
    U_T = _roundup(hi_T, A.rb) if hi_T else 0
    npad_T = L_T + _roundup(nrow, A.rb) + U_T
    rows = [_place_shifted(A.data[d], L_T - A.L + int(A.offsets[d]), npad_T)
            for d in order]
    return SDIA(data=jnp.stack(rows),
                offsets=tuple(offs_T[d] for d in order),
                shape=(ncol, nrow), nnz=A.nnz, L=L_T, rb=A.rb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _spmv_sdia_core(A: SDIA, x: jax.Array, interpret: bool) -> jax.Array:
    return unpad_y(A, spmv_sdia_padded(A, pad_x(A, x), interpret=interpret))


def _spmv_sdia_fwd(A, x, interpret):
    return _spmv_sdia_core(A, x, interpret), (A, x)


def _spmv_sdia_bwd(interpret, res, g):
    """Reverse-mode rules (Pallas kernels are not auto-differentiable):

    - ``x_bar = A^T g`` — one pass of the SAME streaming kernel on the
      transposed operator (:func:`transpose_sdia`);
    - ``data_bar[d, k] = g_pad[k] * x_pad[k + off_d]`` — elementwise in
      padded row space.  Both pads and out-of-range slots come out
      exactly zero (``g_pad``/``x_pad`` are zero there), matching the
      primal's structural-zero invariant; roll wraparound only ever
      lands on zero ``g_pad`` slots (valid k has ``k + off`` within
      ``[L - lo, L + nrow + hi) ⊆ [0, npad)``).
    """
    A, x = res
    x_bar = _spmv_sdia_core(transpose_sdia(A), g, interpret)
    gp = pad_x(A, g)
    xp = pad_x(A, x)
    rows = [gp * jnp.roll(xp, -int(off)) for off in A.offsets]
    A_bar = SDIA(data=jnp.stack(rows).astype(A.data.dtype),
                 offsets=A.offsets, shape=A.shape, nnz=A.nnz, L=A.L,
                 rb=A.rb)
    return (A_bar, x_bar)


_spmv_sdia_core.defvjp(_spmv_sdia_fwd, _spmv_sdia_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmv_sdia(A: SDIA, x: jax.Array, y: jax.Array | None = None, *,
              interpret: bool = False) -> jax.Array:
    """``A @ x`` (+ ``y``) with plain ``[n]`` vectors (pads internally).

    Differentiable in both ``x`` and ``A.data`` via a custom VJP
    (``x_bar`` runs the transposed streaming kernel; see
    :func:`_spmv_sdia_bwd`)."""
    out = _spmv_sdia_core(A, x, interpret)
    return out if y is None else y + out


# ---------------------------------------------------------------------------
# Periodic-coefficient streaming DIA — grid-stencil matrices
# ---------------------------------------------------------------------------
#
# Every diagonal of a separable grid-stencil matrix (2-D/3-D Poisson,
# block-Laplacian rows, any kron(I, T)+kron(T, I) operator) is PERIODIC
# along the row index with period = the grid minor dimension: e.g. the
# 4096-grid Poisson's off-1 diagonal is ``-1`` except a ``0`` every
# 4096-th row, and the main diagonal is constant.  Streaming those
# coefficients from HBM (335 MB of the 470 MB per-iter working set of the
# 16.7M-row operand) is pure waste: ONE period per diagonal (16 KB) held
# VMEM-resident replaces the whole data stream, cutting the per-SpMV HBM
# traffic to x + y (~134 MB, 3.5x less).  This is the TPU-first trade —
# recompute/reuse from on-chip memory instead of streaming — and it is
# exactly what distinguishes a stencil operator from a general sparse
# matrix.  Periodicity is *verified*, not assumed: ``pack_psdia`` compares
# the tiled pattern against every in-range diagonal entry on device and
# refuses to build the operator on any mismatch, so the kernel is exact
# for any matrix it accepts (general DIA matrices stay on ``SDIA``).
#
# Reference parity: the DIA kernel `/root/reference/src/mat_vec.cpp:123-146`
# (same y = A @ x semantics; the reference has no stencil specialization).


def _lcm(a: int, b: int) -> int:
    import math

    return a * b // math.gcd(a, b)


@sparse_dataclass
class PSDIA:
    """Periodic DIA matrix for the streaming kernel.

    ``pattern[d, i]`` holds diagonal ``offsets[d]`` at global row
    ``i mod period`` — pre-tiled to a full ``[ndiags, rb]`` row tile so the
    kernel block is layout-identical to :class:`SDIA`'s data block, but
    with a CONSTANT index map (Pallas fetches it once and keeps it
    VMEM-resident across the whole grid).  Pad/edge handling moves from
    structurally-zero data to an in-kernel row-validity mask.
    """

    pattern: jax.Array                    # [ndiags, rb]
    offsets: tuple[int, ...] = static_field()
    shape: tuple[int, int] = static_field()
    nnz: int = static_field()
    L: int = static_field()               # front pad rows (multiple of rb)
    period: int = static_field()
    rb: int = static_field(default=RB)

    @property
    def npad(self) -> int:
        hi = max(0, max(self.offsets))
        U = _roundup(hi, self.rb) if hi else 0
        return self.L + _roundup(self.shape[0], self.rb) + U

    @property
    def ndiags(self) -> int:
        return int(self.pattern.shape[0])

    @property
    def dtype(self):
        return self.pattern.dtype

    @property
    def data(self):  # bench/debug convenience: materialized [ndiags, nrow]
        nrow = self.shape[0]
        reps = -(-nrow // self.period)
        full = jnp.tile(self.pattern[:, :self.period], (1, reps))[:, :nrow]
        i = jnp.arange(nrow)
        offs = jnp.asarray(self.offsets)[:, None]
        valid = (i[None, :] + offs >= 0) & (i[None, :] + offs < nrow)
        return jnp.where(valid, full, 0)


def detect_period(dia: DIA, max_period: int = 1 << 20) -> int | None:
    """Smallest period P (from the offset-derived candidate set) such that
    every diagonal is P-periodic over its in-range rows — host-side
    analysis (returns ``None`` for device-resident data; device packs pass
    ``period`` explicitly and rely on :func:`pack_psdia`'s verification).

    Candidates: 1 (Toeplitz/constant diagonals) and each distinct
    ``|offset| > 1`` ascending — the minor grid dimension of any
    separable stencil appears among its offsets.
    """
    data = dia.data
    if isinstance(data, jax.Array):
        if next(iter(data.devices())).platform != "cpu":
            return None       # no device readback during planning
        data = np.asarray(data)
    else:
        data = np.asarray(data)
    nrow = dia.shape[0]
    cands = [1] + sorted({abs(int(o)) for o in dia.offsets} - {0, 1})
    for P in cands:
        if P > max_period or 2 * P > nrow:
            continue
        ok = True
        for d, off in enumerate(dia.offsets):
            off = int(off)
            seg = data[d, max(0, -off):nrow - max(0, off)]
            if seg.size > P and not np.array_equal(seg[P:], seg[:-P]):
                ok = False
                break
        if ok:
            return P
    return None


@functools.partial(jax.jit, static_argnames=("offsets", "nrow"))
def _verify_periodic(data, pat, offsets, nrow):
    """True iff ``data`` equals the tiled ``pat`` at every in-range slot
    (out-of-range slots multiply structural x-pad zeros — don't-care)."""
    P = pat.shape[1]
    reps = -(-nrow // P)
    full = jnp.tile(pat, (1, reps))[:, :nrow]
    i = jnp.arange(nrow)
    offs = jnp.asarray(offsets)[:, None]
    valid = (i[None, :] + offs >= 0) & (i[None, :] + offs < nrow)
    return jnp.all(jnp.where(valid, data == full, True))


def _pattern_budget(nd: int) -> int:
    """VMEM budget for the resident [ndiags, rb] pattern block (single
    copy — constant index map, not double-buffered like SDIA's streamed
    data).  Measured on chip (round-4 rb sweeps): the 5-diagonal 2-D
    Poisson wants the fattest tile (rb 65536/102400/131072 -> 0.226/
    0.199/0.197 ms at 4096^2), but the 7-diagonal 3-D Poisson is 14%
    FASTER at rb=65536 than at 131072 (25.3 vs 29.4 us at 128^3 — the
    fatter pattern crowds the pipelined x/halo blocks), so wider
    stencils get a tighter budget."""
    return (8 << 20) if nd <= 5 else (2 << 20)


def pack_psdia(dia: DIA, period: int | None = None, *, rb: int | None = None,
               nrhs: int = 1, verify: bool = True) -> PSDIA:
    """Build the periodic streaming operator from a DIA matrix.

    ``period=None`` auto-detects on host data (:func:`detect_period`);
    device-built DIA operands pass the known period explicitly.  With
    ``verify=True`` (default) the claim is checked ON DEVICE against every
    in-range entry and a mismatch raises — the kernel is only ever exact.
    """
    nrow, ncol = dia.shape
    if nrow != ncol:
        raise ValueError("psdia needs a square matrix")
    if period is None:
        period = detect_period(dia)
        if period is None:
            on_device = (isinstance(dia.data, jax.Array)
                         and next(iter(dia.data.devices())).platform
                         != "cpu")
            raise ValueError(
                "no periodic diagonal structure detected"
                + (" (device-resident diagonals are not scanned — pass "
                   "period= explicitly; it is verified on device)"
                   if on_device else ""))
    P = int(period)
    nd = dia.ndiags
    offsets = tuple(int(o) for o in dia.offsets)
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    if rb is None:
        # lane-tile-aligned AND period-aligned (constant pattern phase).
        # Unlike SDIA there is no streamed data block, so go as fat as the
        # resident pattern (and any multi-RHS panels) allow — measured on
        # the 16.7M-row Poisson: rb 65536 -> 131072 takes 0.286 -> 0.254
        # ms/iter (fewer grid steps + smaller halo fraction).
        unit = _lcm(P, 1024)
        if unit > RB_MAX:
            raise ValueError("period too large for any feasible row tile")
        isz = int(np.dtype(dia.data.dtype).itemsize)
        cap = min(RB_MAX, max(_pattern_budget(nd) // (isz * nd), 1))
        if nrhs > 1:
            # X/Y panels are in the (4-byte) x dtype, not the pattern's
            cap = min(cap, max((8 << 20) // (4 * nrhs), 1))
        rb = max(unit, cap - cap % unit)
        # don't pad small matrices out to giant tiles
        small = _roundup(max(nrow, lo, hi, 1), unit)
        rb = min(rb, max(small, unit))
        if max(lo, hi, 1) > rb:         # wide band: raise rb to cover it
            rb = _roundup(max(lo, hi), unit)
    if rb % P or rb > RB_MAX or max(lo, hi, 1) > rb:
        raise ValueError(
            f"psdia needs rb a multiple of period={P} covering the band, "
            f"<= {RB_MAX}; got rb={rb}")
    # extract the pattern from the first period window that is in-range
    # for EVERY diagonal (phase k0*P ≡ 0 mod P keeps alignment)
    k0 = -(-lo // P)
    if (k0 + 1) * P > nrow - hi:
        raise ValueError("matrix too small to extract an in-range period")
    if isinstance(dia.data, jax.Array):
        # device-resident operand: slice + verify on device (one stream)
        pat = jax.lax.slice(dia.data, (0, k0 * P), (nd, (k0 + 1) * P))
        if verify and not bool(_verify_periodic(dia.data, pat, offsets,
                                                nrow)):
            raise ValueError(f"diagonals are not periodic with period {P}")
        pattern = jnp.tile(pat, (1, rb // P))
    else:
        # host numpy operand (the planner path): verify on host, ship ONLY
        # the tiled pattern (nd*rb values) through the host->device tunnel
        # — the full [nd, nrow] data never leaves the host
        hdata = np.asarray(dia.data)
        pat = hdata[:, k0 * P:(k0 + 1) * P]
        if verify:
            i = np.arange(nrow)
            reps = -(-nrow // P)
            full = np.tile(pat, (1, reps))[:, :nrow]
            offs = np.asarray(offsets)[:, None]
            valid = (i[None, :] + offs >= 0) & (i[None, :] + offs < nrow)
            if not np.all(np.where(valid, hdata == full, True)):
                raise ValueError(
                    f"diagonals are not periodic with period {P}")
        pattern = jnp.asarray(np.tile(pat, (1, rb // P)))
    L = _roundup(lo, rb) if lo else 0
    return PSDIA(pattern=pattern, offsets=offsets, shape=dia.shape,
                 nnz=dia.nnz, L=L, period=P, rb=rb)


def _rows_iota(rb: int):
    # Mosaic has no 1-D iota; build [1, rb] and collapse
    return jnp.reshape(jax.lax.broadcasted_iota(jnp.int32, (1, rb), 1), (rb,))


def _pkernel(pat_ref, xm_ref, x0_ref, xp_ref, o_ref, *, offsets, rb, h,
             L, nrow):
    win = jnp.concatenate([xm_ref[:], x0_ref[:], xp_ref[:]])
    acc = pat_ref[0] * jax.lax.slice_in_dim(win, h + offsets[0],
                                            h + offsets[0] + rb)
    for d, off in enumerate(offsets[1:], start=1):
        acc = acc + pat_ref[d] * jax.lax.slice_in_dim(win, h + off,
                                                      h + off + rb)
    # row-validity masking is predicated OFF the interior tiles (all but
    # the pad/tail tiles) — the iota/compare/select chain would otherwise
    # cost ~4 VPU ops/row on a kernel that is VPU-bound once the data
    # stream is gone
    j = pl.program_id(0)
    interior = jnp.logical_and(j * rb >= L, (j + 1) * rb <= L + nrow)

    @pl.when(interior)
    def _():
        o_ref[:] = acc

    @pl.when(jnp.logical_not(interior))
    def _():
        rows = j * rb + _rows_iota(rb)
        valid = (rows >= L) & (rows < L + nrow)
        o_ref[:] = jnp.where(valid, acc, jnp.zeros_like(acc))


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmv_psdia_padded(A: PSDIA, xpad: jax.Array,
                      dead: jax.Array | None = None, *,
                      interpret: bool = False) -> jax.Array:
    """``ypad = A @ xpad`` in padded row space — same contract as
    :func:`spmv_sdia_padded` (shape-preserving, chainable, pads stay zero
    via the in-kernel row mask instead of zero data; ``dead`` = donated
    output buffer for zero-copy chains, :func:`_dead_out`)."""
    rb = A.rb
    npad = A.npad
    T = npad // rb
    nd = A.ndiags
    h = _halo_size(A.offsets, rb)
    hb = rb // h
    TH = npad // h

    kern, in_specs, ops, extra = _dead_out(
        functools.partial(_pkernel, offsets=A.offsets, rb=rb, h=h,
                          L=A.L, nrow=A.shape[0]),
        [
            # constant index map: fetched once, VMEM-resident all grid long
            pl.BlockSpec((nd, rb), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda j: (jnp.clip(j * hb - 1, 0, TH - 1),),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb,), lambda j: (j,), memory_space=pltpu.VMEM),
            pl.BlockSpec((h,),
                         lambda j: (jnp.clip((j + 1) * hb, 0, TH - 1),),
                         memory_space=pltpu.VMEM),
        ],
        (A.pattern, xpad, xpad, xpad), dead)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (npad,), jnp.result_type(A.pattern.dtype, xpad.dtype)),
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb,), lambda j: (j,),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **extra,
    )(*ops)


def transpose_psdia(A: PSDIA) -> PSDIA:
    """``A^T`` as another periodic operator — no data movement beyond a
    cyclic roll of each (tiny) pattern row.

    Derivation: ``A^T[i, i+o'] = A[i+o', i] = data[d][i+o']`` with
    ``off_d = -o'`` — the transposed diagonal is the original one shifted
    by ``o'``, and a shift of a P-periodic sequence is a cyclic roll of
    its pattern (``rb % P == 0`` keeps the tiled layout consistent).
    """
    offs_T = [-int(o) for o in A.offsets]
    order = sorted(range(len(offs_T)), key=lambda d: offs_T[d])
    pat_T = jnp.stack([jnp.roll(A.pattern[d], -offs_T[d]) for d in order])
    offsets_T = tuple(offs_T[d] for d in order)
    lo_T = max(0, -min(offsets_T))
    L_T = _roundup(lo_T, A.rb) if lo_T else 0
    return PSDIA(pattern=pat_T, offsets=offsets_T,
                 shape=(A.shape[1], A.shape[0]), nnz=A.nnz, L=L_T,
                 period=A.period, rb=A.rb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _spmv_psdia_core(A: PSDIA, x: jax.Array, interpret: bool) -> jax.Array:
    return unpad_y(A, spmv_psdia_padded(A, pad_x(A, x),
                                        interpret=interpret))


def _spmv_psdia_fwd(A, x, interpret):
    return _spmv_psdia_core(A, x, interpret), (A, x)


def _spmv_psdia_bwd(interpret, res, g):
    """Reverse-mode rules (Pallas kernels are not auto-differentiable):

    - ``x_bar = A^T g`` — one pass of the SAME streaming kernel on the
      transposed operator (:func:`transpose_psdia`);
    - ``pattern_bar[d, j] = sum_t (g_pad * shift(x_pad, off_d))[t*rb+j]``
      — tile slot j serves padded row t*rb+j, so the cotangent folds over
      the grid tiles (pads/out-of-range slots contribute exact zeros, the
      same don't-care structure the primal relies on).  Matrix learning
      (fitted stencils) works at streaming speed.
    """
    A, x = res
    x_bar = _spmv_psdia_core(transpose_psdia(A), g, interpret)
    gp = pad_x(A, g)
    xp = pad_x(A, x)
    rows = []
    for off in A.offsets:
        # no wraparound reaches a nonzero gp slot: valid k has
        # k + off in [L - lo, L + nrow + hi) ⊆ [0, npad)
        rows.append(jnp.sum((gp * jnp.roll(xp, -int(off)))
                            .reshape(-1, A.rb), axis=0))
    A_bar = PSDIA(pattern=jnp.stack(rows).astype(A.pattern.dtype),
                  offsets=A.offsets, shape=A.shape, nnz=A.nnz, L=A.L,
                  period=A.period, rb=A.rb)
    return (A_bar, x_bar)


_spmv_psdia_core.defvjp(_spmv_psdia_fwd, _spmv_psdia_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmv_psdia(A: PSDIA, x: jax.Array, y: jax.Array | None = None, *,
               interpret: bool = False) -> jax.Array:
    """``A @ x`` (+ ``y``) with plain ``[n]`` vectors (pads internally).

    Differentiable in both ``x`` and ``A.pattern`` via a custom VJP
    (``x_bar`` runs the transposed periodic kernel; see
    :func:`_spmv_psdia_bwd`)."""
    out = _spmv_psdia_core(A, x, interpret)
    return out if y is None else y + out


def _pspmm_kernel(pat_ref, xm_ref, x0_ref, xp_ref, o_ref, *, offsets, rb, h,
                  L, nrow, pid_axis=0):
    pieces = _spmm_acc(lambda d: pat_ref[d], xm_ref[:], x0_ref[:],
                       xp_ref[:], offsets, rb, h)
    j = pl.program_id(pid_axis)
    interior = jnp.logical_and(j * rb >= L, (j + 1) * rb <= L + nrow)

    @pl.when(interior)
    def _():
        _spmm_store(o_ref, pieces, rb, h)

    @pl.when(jnp.logical_not(interior))
    def _():
        acc = (pieces[0] if len(pieces) == 1
               else jnp.concatenate(pieces, axis=1))
        rows = j * rb + jax.lax.broadcasted_iota(jnp.int32, (1, rb), 1)
        valid = (rows >= L) & (rows < L + nrow)
        o_ref[:] = jnp.where(valid, acc, jnp.zeros_like(acc))


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmm_psdia_padded_t(A: PSDIA, Xt_pad: jax.Array,
                        dead: jax.Array | None = None, *,
                        interpret: bool = False) -> jax.Array:
    """``Yt_pad = (A @ Xt_pad.T).T`` for transposed ``[nrhs, npad]``
    operands — same contract as :func:`spmm_sdia_padded_t` (``dead`` =
    donated output for zero-copy chains; measured 13.5 -> 6.9 ms at
    nrhs=32 on the 16.7M-row Poisson, the while-carry copy elided)."""
    rb = A.rb
    npad = A.npad
    T = npad // rb
    nd = A.ndiags
    nrhs = int(Xt_pad.shape[0])
    h = _halo_size(A.offsets, rb)
    hb = rb // h
    TH = npad // h

    kern, in_specs, ops, extra = _dead_out(
        functools.partial(_pspmm_kernel, offsets=A.offsets, rb=rb, h=h,
                          L=A.L, nrow=A.shape[0]),
        [
            pl.BlockSpec((nd, rb), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nrhs, h),
                         lambda j: (0, jnp.clip(j * hb - 1, 0, TH - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nrhs, rb), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nrhs, h),
                         lambda j: (0, jnp.clip((j + 1) * hb, 0, TH - 1)),
                         memory_space=pltpu.VMEM),
        ],
        (A.pattern, Xt_pad, Xt_pad, Xt_pad), dead)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (nrhs, npad),
            jnp.result_type(A.pattern.dtype, Xt_pad.dtype)),
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nrhs, rb), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SPMM_VMEM_MB * 1024 * 1024),
        interpret=interpret,
        **extra,
    )(*ops)


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmm_psdia(A: PSDIA, X: jax.Array, *,
               interpret: bool = False) -> jax.Array:
    """``A @ X`` with plain ``[n, nrhs]`` operands (transposes in/out)."""
    Xt = jnp.pad(X.T, ((0, 0), (A.L, A.npad - A.L - X.shape[0])))
    Yt = spmm_psdia_padded_t(A, Xt, interpret=interpret)
    return jax.lax.slice_in_dim(Yt, A.L, A.L + A.shape[0], axis=1).T
