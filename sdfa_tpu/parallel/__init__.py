from . import mesh
from .mesh import batch_sharding, make_mesh, pad_batch_to_devices, replicate, shard_batch

__all__ = [
    "mesh",
    "batch_sharding",
    "make_mesh",
    "pad_batch_to_devices",
    "replicate",
    "shard_batch",
]
