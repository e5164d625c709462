"""Parallelism: device meshes, sharding placement, multi-host bring-up."""

from .distributed import init_distributed, is_multi_host, local_batch_slice  # noqa: F401
from .mesh import batch_sharder, make_mesh, replicate  # noqa: F401
from .spatial import spatial_sharder, spatial_spec  # noqa: F401

__all__ = ["make_mesh", "batch_sharder", "replicate",
           "spatial_sharder", "spatial_spec",
           "init_distributed", "is_multi_host", "local_batch_slice"]
