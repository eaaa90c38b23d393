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
from .sharded_eval import make_sharded_eval_fn, sharded_evaluate
from .edge_partition_fast import (
    FastEdgePartition,
    build_fast_edge_partition,
    ep_to_items,
    ep_to_users,
    make_fast_edge_fns,
    merge_ep_view,
    place_item_op,
    split_ep_tree,
)

__all__ = [
    "make_mesh",
    "mesh_factorization",
    "make_sharded_train_step",
    "make_sharded_fast_train_step",
    "make_sharded_eval_fn",
    "sharded_evaluate",
    "shard_fast_bipartite",
    "shard_graph",
    "shard_params",
    "EdgePartition",
    "build_edge_partition",
    "make_explicit_fns",
    "pad_params",
    "FastEdgePartition",
    "build_fast_edge_partition",
    "ep_to_items",
    "ep_to_users",
    "make_fast_edge_fns",
    "merge_ep_view",
    "place_item_op",
    "split_ep_tree",
]
