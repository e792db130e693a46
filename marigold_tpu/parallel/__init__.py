from marigold_tpu.parallel.mesh import (
    get_mesh,
    shard_batch,
    replicate,
    data_parallel_sharding,
)

__all__ = ["get_mesh", "shard_batch", "replicate", "data_parallel_sharding"]
