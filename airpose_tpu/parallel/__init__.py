from .mesh import (
    batch_sharding,
    make_mesh,
    make_mesh_2d,
    param_spec,
    replicate,
    shard_batch,
    shard_params_tp,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "make_mesh_2d",
    "param_spec",
    "replicate",
    "shard_batch",
    "shard_params_tp",
]
