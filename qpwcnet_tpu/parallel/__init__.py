from qpwcnet_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_for_batch,
    put_batch,
    shard_batch,
    replicate,
    make_parallel_step,
)
from qpwcnet_tpu.parallel.multihost import (
    initialize_distributed,
    make_global_batch,
    is_primary,
)
from qpwcnet_tpu.parallel.spatial import (
    make_spatial_forward,
    make_spatial_train_step,
    shard_batch_spatial,
)
from qpwcnet_tpu.parallel.spatial_ops import (
    SpatialConfig,
    backward_warp_spatial,
    cost_volume_spatial,
)

__all__ = [
    "SpatialConfig",
    "backward_warp_spatial",
    "cost_volume_spatial",
    "make_mesh",
    "make_mesh_for_batch",
    "put_batch",
    "shard_batch",
    "replicate",
    "make_parallel_step",
    "make_spatial_forward",
    "make_spatial_train_step",
    "shard_batch_spatial",
    "initialize_distributed",
    "make_global_batch",
    "is_primary",
]
