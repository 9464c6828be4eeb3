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
           "spmm_sdia_padded_t", "spmm_sdia", "supports_sdia"]

#: floor rows per grid tile (multiple of 1024); :func:`pack_sdia` auto-
#: selects up to RB_MAX subject to the data-block VMEM budget — fatter
#: tiles cut grid-step fixed cost and halo refetch (measured on the
#: 16.7M-row Poisson operand: 0.822 -> 0.848 of stream roofline going
#: 16384 -> 65536)
RB = 16384
RB_MAX = 131072
#: per-buffer budget for the [ndiags, rb] data block (double-buffered)
_DATA_BLOCK_BUDGET = 3 << 20


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


def _auto_rb(ndiags: int, offsets, nrow: int, nrhs: int = 1) -> int | None:
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
    while rb > RB and ndiags * rb * 4 > _DATA_BLOCK_BUDGET:
        rb //= 2
    while rb > RB and rb >= 4 * nrow:
        rb //= 2
    while rb > 4096 and nrhs * rb * 4 > (8 << 20):
        rb //= 2
    if need > rb:
        rb = need
        if rb > RB_MAX or ndiags * rb * 4 > 2 * _DATA_BLOCK_BUDGET:
            return None
    return rb


def supports_sdia(offsets, shape, rb: int | None = None) -> bool:
    if shape[0] != shape[1]:
        return False
    if rb is None:
        return _auto_rb(len(offsets), offsets, shape[0]) is not None
    return max(abs(int(o)) for o in offsets) <= rb


def pack_sdia(dia: DIA, rb: int | None = None, *, nrhs: int = 1) -> SDIA:
    """Lay a DIA matrix out in padded-tile row space (device-side ops —
    no host round-trip, so packing a 335 MB operand costs one stream).

    ``rb=None`` auto-selects the tile size (see :func:`_auto_rb`); pass
    the intended ``nrhs`` when the pack will mostly serve
    :func:`spmm_sdia_padded_t` — the multi-RHS panels change the VMEM
    optimum."""
    nrow, ncol = dia.shape
    if rb is None:
        rb = _auto_rb(dia.ndiags, dia.offsets, nrow, nrhs=nrhs)
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
def spmv_sdia_padded(A: SDIA, xpad: jax.Array, *,
                     interpret: bool = False) -> jax.Array:
    """``ypad = A @ xpad`` in padded row space (``[npad] -> [npad]``).

    Shape-preserving — chain it directly (``xpad[k] = x[k - L]``, pads
    stay zero because pad tiles have all-zero data).

    x rides in three aliased views: the own ``RB`` block plus two
    ``H``-sized neighbor slivers (H = smallest aligned block covering the
    band), so the refetch overhead is ``2H/RB`` instead of 2x.  Edge
    index clamps feed only pure-pad tiles (structurally zero data).
    """
    rb = A.rb
    npad = A.npad
    T = npad // rb
    nd = A.ndiags
    h = _halo_size(A.offsets, rb)
    hb = rb // h                     # halo blocks per row tile
    TH = npad // h

    return pl.pallas_call(
        functools.partial(_kernel, offsets=A.offsets, rb=rb, h=h),
        out_shape=jax.ShapeDtypeStruct((npad,), A.data.dtype),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((nd, rb), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda j: (jnp.clip(j * hb - 1, 0, TH - 1),),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb,), lambda j: (j,), memory_space=pltpu.VMEM),
            pl.BlockSpec((h,),
                         lambda j: (jnp.clip((j + 1) * hb, 0, TH - 1),),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb,), lambda j: (j,),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A.data, xpad, xpad, xpad)


def _spmm_kernel(data_ref, xm_ref, x0_ref, xp_ref, o_ref, *, offsets, rb, h):
    win = jnp.concatenate([xm_ref[:], x0_ref[:], xp_ref[:]], axis=1)
    acc = data_ref[0][None, :] * jax.lax.slice_in_dim(
        win, h + offsets[0], h + offsets[0] + rb, axis=1)
    for d, off in enumerate(offsets[1:], start=1):
        acc = acc + data_ref[d][None, :] * jax.lax.slice_in_dim(
            win, h + off, h + off + rb, axis=1)
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmm_sdia_padded_t(A: SDIA, Xt_pad: jax.Array, *,
                       interpret: bool = False) -> jax.Array:
    """``Yt_pad = (A @ Xt_pad.T).T`` for TRANSPOSED multi-RHS operands
    ``[nrhs, npad]``.

    The transposed layout is load-bearing, not cosmetic: a ``[n, nrhs]``
    array with ``nrhs < 128`` pads its lane dimension to 128 on TPU — a
    4x memory blow-up (8 GB for the 16.7M-row bench operand).  With rows
    on the lane dimension the layout is dense, and each diagonal is a
    lane-shifted slice of the ``[nrhs, rb + 2h]`` window (same static-
    slice structure as the SpMV kernel).  Shape-preserving — chainable.
    """
    rb = A.rb
    npad = A.npad
    T = npad // rb
    nd = A.ndiags
    nrhs = int(Xt_pad.shape[0])
    h = _halo_size(A.offsets, rb)
    hb = rb // h
    TH = npad // h

    return pl.pallas_call(
        functools.partial(_spmm_kernel, offsets=A.offsets, rb=rb, h=h),
        out_shape=jax.ShapeDtypeStruct((nrhs, npad), A.data.dtype),
        grid=(T,),
        in_specs=[
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
        out_specs=pl.BlockSpec((nrhs, rb), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        # the multi-RHS window tips the default 16 MB scoped-vmem budget
        # (concat + per-diagonal slice temporaries); raise it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(A.data, Xt_pad, Xt_pad, Xt_pad)


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


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmv_sdia(A: SDIA, x: jax.Array, y: jax.Array | None = None, *,
              interpret: bool = False) -> jax.Array:
    """``A @ x`` (+ ``y``) with plain ``[n]`` vectors (pads internally)."""
    out = unpad_y(A, spmv_sdia_padded(A, pad_x(A, x), interpret=interpret))
    return out if y is None else y + out
