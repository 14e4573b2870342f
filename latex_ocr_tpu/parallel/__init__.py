from .mesh import batch_sharding, make_mesh, replicate, shard_batch
from .region_attention import attention_context_region_sharded, region_sharding

__all__ = [
    "attention_context_region_sharded",
    "batch_sharding",
    "make_mesh",
    "region_sharding",
    "replicate",
    "shard_batch",
]
