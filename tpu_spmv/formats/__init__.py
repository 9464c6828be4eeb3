"""Sparse matrix formats as JAX pytree dataclasses.

Capability parity with the reference's format zoo
(`/root/reference/include/matrix.h`): COO, CSR, CSC, ELL, DIA, plus a real
BSR (the reference only stubs its block format).  Conversions mirror the
reference's conversion-constructor graph (COO→{CSR,CSC,ELL,BSR}, any→COO,
COO→DIA) but are vectorized instead of serial counting-sort loops.
"""

from __future__ import annotations

from .base import INDEX_DTYPE, default_real_dtype
from .coo import COO
from .csr import CSR
from .csc import CSC
from .ell import ELL
from .dia import DIA
from .bsr import BSR
from .bdia import BDIA

__all__ = [
    "COO", "CSR", "CSC", "ELL", "DIA", "BSR", "BDIA",
    "INDEX_DTYPE", "default_real_dtype", "convert", "to_coo",
    "FORMATS",
]

#: name → class registry (CLI / bench harness use this for format sweeps).
FORMATS = {
    "coo": COO,
    "csr": CSR,
    "csc": CSC,
    "ell": ELL,
    "dia": DIA,
    "bsr": BSR,
    "bdia": BDIA,
}

AnyFormat = COO | CSR | CSC | ELL | DIA | BSR | BDIA


def to_coo(mat) -> COO:
    """Any format (tpu_spmv or scipy.sparse) → COO, the canonical
    interchange format."""
    if isinstance(mat, COO):
        return mat
    if hasattr(mat, "to_coo"):
        return mat.to_coo()
    if hasattr(mat, "tocoo"):          # scipy.sparse
        return COO.from_scipy(mat)
    raise TypeError(f"cannot convert {type(mat).__name__} to COO")


def convert(mat: AnyFormat, target: str | type, **kwargs) -> AnyFormat:
    """Convert between any two formats via COO.

    Mirrors the reference's conversion-constructor surface
    (`/root/reference/src/matrix.cpp:115,295,450,673`) as a single
    dispatcher: ``convert(A, "csr")``, ``convert(A, BSR, block_size=8)``.
    """
    if isinstance(target, str):
        try:
            target_cls = FORMATS[target.lower()]
        except KeyError:
            raise ValueError(
                f"unknown format {target!r}; valid: {sorted(FORMATS)}"
            ) from None
    else:
        target_cls = target
    if isinstance(mat, target_cls) and not kwargs:
        return mat
    coo = to_coo(mat)
    if target_cls is COO:
        return coo
    return target_cls.from_coo(coo, **kwargs)
