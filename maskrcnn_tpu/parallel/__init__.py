from .mesh import (
    create_mesh,
    data_sharding,
    replicate,
    replicated,
    shard_batch,
    shard_params,
    tree_shardings,
)

__all__ = [
    "create_mesh",
    "data_sharding",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_params",
    "tree_shardings",
]
