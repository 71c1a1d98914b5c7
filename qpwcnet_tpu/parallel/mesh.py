"""Device-mesh data parallelism (SURVEY.md §2.10).

The reference is single-process single-GPU with no distributed code at
all; here data parallelism is first-class: a 1-D ('data',) Mesh,
NamedSharding annotations on batch and state, and XLA-emitted gradient
all-reduce over ICI. A 'model' axis is reserved in :func:`make_mesh` for
future tensor/spatial sharding (SURVEY.md §5 long-context analog) but the
~5M-param convnet needs none for parity.

Multi-host: call jax.distributed.initialize() before make_mesh(); the
mesh spans all global devices and per-host data loading feeds
jax.make_array_from_process_local_data.
"""

from __future__ import annotations

import math
import warnings
from typing import Callable, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Create a ('data', 'model') mesh. Defaults: all devices on the data
    axis, model axis size 1."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(
        n_data, n_model
    )
    return Mesh(dev_array, ("data", "model"))


def make_mesh_for_batch(
    batch_size: int,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Mesh whose data axis is the largest device count that divides
    ``batch_size`` — so :func:`shard_batch` never hits a divisibility
    error, whatever the batch/device combination (e.g. batch 2 on 8
    virtual devices uses a 2-device data axis)."""
    if devices is None:
        devices = jax.devices()
    n_data = math.gcd(batch_size, len(devices))
    if n_data < len(devices):
        # Correctness-safe but a silent throughput loss otherwise: e.g.
        # batch 12 on 8 devices trains on 4. Make it loud.
        warnings.warn(
            f"make_mesh_for_batch: batch_size={batch_size} is not "
            f"divisible by the {len(devices)} available devices; using "
            f"only {n_data} device(s). Pick a batch size divisible by "
            f"the device count to use all of them.",
            stacklevel=2,
        )
    return make_mesh(n_data=n_data, devices=devices)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree onto the mesh, sharded on axis 0 over
    'data' (leading dim must divide the data axis size). A single-device
    mesh gets a plain device_put — committing NamedShardings there makes
    downstream jits carry SPMD machinery for no benefit."""
    if mesh.devices.size == 1:
        dev = mesh.devices.reshape(-1)[0]
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, dev), batch
        )
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def put_batch(batch, mesh: Mesh):
    """Place a per-host batch on the mesh: single-process -> plain
    device_put sharding; multi-host -> assemble the per-process shards
    into one global data-sharded array (each host loads a disjoint
    slice via PrefetchLoader(shard_index=process_index))."""
    if jax.process_count() > 1:
        from qpwcnet_tpu.parallel.multihost import make_global_batch

        return make_global_batch(batch, mesh)
    return shard_batch(batch, mesh)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / train state) over the mesh.
    Single-device mesh: plain device_put (see shard_batch)."""
    if mesh.devices.size == 1:
        dev = mesh.devices.reshape(-1)[0]
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, dev), tree
        )
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def make_parallel_step(step_fn: Callable, mesh: Mesh,
                       donate_state: bool = True) -> Callable:
    """Jit a (state, batch) -> (state, metrics) step for the mesh:
    state replicated, batch sharded on 'data'. XLA inserts the gradient
    psum over ICI from these shardings alone.

    On a single-device mesh the sharding annotations are semantically a
    no-op, so plain jit (with the same donation) is used."""
    donate = (0,) if donate_state else ()
    if mesh.devices.size == 1:
        return jax.jit(step_fn, donate_argnums=donate)
    state_sh = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, state_sh),
        donate_argnums=donate,
    )
