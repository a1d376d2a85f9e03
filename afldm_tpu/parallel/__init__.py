from .mesh import create_mesh, data_sharding, replicated_sharding
from .collectives import grad_sync, gather_metrics, broadcast, shard_batch

__all__ = ["create_mesh", "data_sharding", "replicated_sharding",
           "grad_sync", "gather_metrics", "broadcast", "shard_batch"]
