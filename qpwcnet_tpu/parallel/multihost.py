"""Multi-host (multi-slice / DCN) utilities.

The reference has no distributed code at all (SURVEY.md §2.10); here
multi-host training is: jax.distributed.initialize() -> global mesh over
all devices -> per-host data loading assembled into global arrays. XLA
emits gradient all-reduces over ICI within a slice and DCN across slices
from the sharding annotations alone.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """jax.distributed.initialize with env-based autodetection (GKE/TPU
    pods set the env automatically; args override)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def make_global_batch(batch: dict, mesh: Mesh) -> dict:
    """Assemble per-host numpy batches into global data-sharded arrays
    (each host loads its own shard; leading dim = per-host batch)."""
    sharding = NamedSharding(mesh, P("data"))

    def to_global(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape
        )

    return jax.tree_util.tree_map(to_global, batch)


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
