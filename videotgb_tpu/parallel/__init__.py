from videotgb_tpu.parallel.mesh import MeshConfig, create_mesh, local_mesh
from videotgb_tpu.parallel.sharding import (
    logical_to_mesh,
    shard_batch,
    shard_params,
    with_sharding,
)

__all__ = [
    "MeshConfig",
    "create_mesh",
    "local_mesh",
    "logical_to_mesh",
    "shard_batch",
    "shard_params",
    "with_sharding",
]
