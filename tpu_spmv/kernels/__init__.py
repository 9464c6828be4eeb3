"""Hand-tiled Pallas TPU kernels (the framework's "native tier").

Populated incrementally: CSR row-block, ELL, BSR/MXU.  See
``tpu_spmv.ops`` for the always-available XLA-level kernels.
"""

__all__ = []
