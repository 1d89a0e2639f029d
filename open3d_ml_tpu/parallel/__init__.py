from .mesh import (batch_sharding, data_parallel_jit, make_mesh,
                   process_allgather, replicate, replicated_sharding,
                   shard_batch)
from .spatial import bev_spatial_sharding, shard_canvas

__all__ = [
    "batch_sharding", "bev_spatial_sharding", "data_parallel_jit",
    "make_mesh", "process_allgather", "replicate", "replicated_sharding",
    "shard_batch", "shard_canvas"
]
