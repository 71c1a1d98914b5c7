"""Spatial-sharding tests: H-sharded forward over a (data=2, model=4)
mesh matches the unsharded forward (XLA inserts conv halo exchanges)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpwcnet_tpu.parallel import make_mesh
from qpwcnet_tpu.parallel.spatial import (
    make_spatial_forward,
    shard_batch_spatial,
)


@pytest.mark.slow
def test_spatial_forward_matches_unsharded(flow_setup):
    from tests.conftest import TEST_HW

    h, w = 128, 64  # H large enough to split 4 ways and keep 32-divis.
    model, variables = flow_setup
    del TEST_HW  # params are shape-independent; apply at (128, 64)

    rng = np.random.RandomState(0)
    ims = jnp.asarray(
        rng.uniform(-0.5, 0.5, (2, h, w, 6)).astype(np.float32))

    ref = model.apply(variables, ims, train=False)

    mesh = make_mesh(n_data=2, n_model=4)
    fwd = make_spatial_forward(
        lambda v, x: model.apply(v, x, train=False), mesh)
    out = fwd(variables, shard_batch_spatial(ims, mesh))
    assert out.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data", "model")), out.ndim)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3
    )
