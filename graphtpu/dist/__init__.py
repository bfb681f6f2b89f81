from graphtpu.dist.mesh import make_mesh, device_count
from graphtpu.dist.sgns_dp import make_sgns_train_step
from graphtpu.dist.simrank_sharded import sharded_exact_simrank
from graphtpu.dist.spmm_summa import make_2d_mesh, summa_simrank_spmm
from graphtpu.dist.frontier import (
    distributed_uniform_walks,
    exchange_by_owner,
    narrowest_int_dtype,
    reset_wire_stats,
    wire_stats,
)

__all__ = [
    "make_mesh",
    "device_count",
    "make_sgns_train_step",
    "sharded_exact_simrank",
    "exchange_by_owner",
    "distributed_uniform_walks",
    "narrowest_int_dtype",
    "reset_wire_stats",
    "wire_stats",
    "make_2d_mesh",
    "summa_simrank_spmm",
]
