from .mesh import make_mesh, mesh_from_string, MeshConfig
from .sharding import (batch_sharding, params_sharding, replicate,
                       shard_batch, shard_params)

__all__ = [
    "make_mesh", "mesh_from_string", "MeshConfig", "batch_sharding",
    "params_sharding", "replicate", "shard_batch", "shard_params",
]
