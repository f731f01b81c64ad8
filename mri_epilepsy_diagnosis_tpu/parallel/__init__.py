from .sharding import (batch_sharding, replicate, shard_batch,
                       volume_sharding, halo_exchange, make_parallel_apply)

__all__ = ["batch_sharding", "replicate", "shard_batch", "volume_sharding",
           "halo_exchange", "make_parallel_apply"]
