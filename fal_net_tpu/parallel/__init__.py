"""Device-mesh parallelism utilities."""

from fal_net_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicate_sharding,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicate_sharding", "shard_batch"]
