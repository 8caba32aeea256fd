from .mesh import (
    batch_sharding,
    initialize_distributed,
    latent_sharding,
    make_mesh,
    param_sharding,
    process_local_batch_slice,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "batch_sharding",
    "initialize_distributed",
    "latent_sharding",
    "make_mesh",
    "param_sharding",
    "process_local_batch_slice",
    "replicated",
    "shard_batch",
    "shard_params",
]
