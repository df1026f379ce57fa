from nirgan_tpu.parallel.mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    pad_batch,
    replicate,
    initialize_multihost,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "pad_batch",
    "replicate",
    "initialize_multihost",
]
