from .sharding import (batch_sharding, check_shard_divisibility, replicate,
                       shard_batch, volume_sharding, halo_exchange,
                       make_parallel_apply)

__all__ = ["batch_sharding", "check_shard_divisibility", "replicate",
           "shard_batch", "volume_sharding", "halo_exchange",
           "make_parallel_apply"]
