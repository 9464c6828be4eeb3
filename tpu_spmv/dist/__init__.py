"""Distribution layer: mesh sharding replacing the reference's NUMA tier.

The mapping (SURVEY.md §2.2):

| reference (NUMA/pthreads)                    | here                         |
|----------------------------------------------|------------------------------|
| ``numa_num_configured_nodes`` topology       | ``make_mesh``                |
| even row split (`mat_vec.cpp:163-168`)       | ``plan_rows`` (nnz-balanced) |
| ``numa_alloc_onnode`` + memcpy slices        | ``ShardedCSR.build``+``place``|
| full-x replication per thread                | ``spmv_allgather``           |
| (absent)                                     | ``spmv_halo`` (ppermute ring)|
| per-thread fast local kernel (`:507-530`)    | ``plan_dist_spmv`` → sharded |
|                                              | DIA/BDIA shifted FMAs        |
| CSC column slabs, y never reduced (Q5)       | ``spmv_colsplit``            |
|                                              | (``psum_scatter`` reduction) |
| pthread create/join barrier                  | SPMD program under ``jit``   |
"""

from .partition import RowPlan, plan_rows, plan_even, plan_uniform
from .sharded import (ShardedVector, ShardedCSR, HaloCSR, NeighborCSR,
                      ColShardedCSR)
from .spmv import (spmv_allgather, spmv_halo, spmv_neighbor, spmv_colsplit,
                   spmm_allgather, spmm_halo, spmm_neighbor, place,
                   sharded_spec)
from .planned import (ShardedDIA, ShardedBDIA, ShardedSDIA, ShardedPSDIA,
                      ShardedGPR,
                      spmv_dia_sharded, spmv_bdia_sharded,
                      spmv_sdia_sharded, spmv_psdia_sharded,
                      spmv_gpr_sharded,
                      DistPlan, plan_dist_spmv, predict_dist_costs)
from .mesh import make_mesh, init_multihost, device_count
from . import blas

__all__ = [
    "RowPlan", "plan_rows", "plan_even", "plan_uniform",
    "ShardedVector", "ShardedCSR", "HaloCSR", "NeighborCSR",
    "ColShardedCSR",
    "spmv_allgather", "spmv_halo", "spmv_neighbor", "spmv_colsplit",
    "spmm_allgather", "spmm_halo", "spmm_neighbor",
    "ShardedDIA", "ShardedBDIA", "ShardedSDIA", "ShardedPSDIA",
    "ShardedGPR",
    "spmv_dia_sharded", "spmv_bdia_sharded", "spmv_sdia_sharded",
    "spmv_psdia_sharded", "spmv_gpr_sharded",
    "DistPlan", "plan_dist_spmv", "predict_dist_costs",
    "place", "sharded_spec",
    "make_mesh", "init_multihost", "device_count",
    "blas",
]
