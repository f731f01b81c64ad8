from .mesh import create_mesh, data_sharding, replicated_sharding, local_device_count
from .rngs import seed_everything, RngStream
from .dtypes import Policy, DEFAULT_POLICY

__all__ = [
    "create_mesh", "data_sharding", "replicated_sharding", "local_device_count",
    "seed_everything", "RngStream", "Policy", "DEFAULT_POLICY",
]
