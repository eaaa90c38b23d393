from .mesh import make_mesh, mesh_factorization
from .sharded_train import make_sharded_train_step, shard_graph, shard_params

__all__ = [
    "make_mesh",
    "mesh_factorization",
    "make_sharded_train_step",
    "shard_graph",
    "shard_params",
]
