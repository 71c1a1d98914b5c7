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

__all__ = [
    "make_mesh",
    "make_mesh_for_batch",
    "put_batch",
    "shard_batch",
    "replicate",
    "make_parallel_step",
    "initialize_distributed",
    "make_global_batch",
    "is_primary",
]
