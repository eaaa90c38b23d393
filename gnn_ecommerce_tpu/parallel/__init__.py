from .mesh import make_mesh, mesh_factorization
from .sharded_train import (
    make_sharded_fast_train_step,
    make_sharded_train_step,
    shard_fast_bipartite,
    shard_graph,
    shard_params,
)
from .edge_partition import (
    EdgePartition,
    build_edge_partition,
    make_explicit_fns,
    pad_params,
)

__all__ = [
    "make_mesh",
    "mesh_factorization",
    "make_sharded_train_step",
    "make_sharded_fast_train_step",
    "shard_fast_bipartite",
    "shard_graph",
    "shard_params",
    "EdgePartition",
    "build_edge_partition",
    "make_explicit_fns",
    "pad_params",
]
