"""Gradient parity of the Pallas cost-volume custom VJP vs the XLA
formulation's autodiff (interpret mode on the CPU test platform)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpwcnet_tpu.ops.cost_volume import cost_volume_xla
from qpwcnet_tpu.ops.pallas.cost_volume_kernel import cost_volume_pallas


@pytest.mark.slow
def test_pallas_grad_matches_xla():
    rng = np.random.RandomState(0)
    prv = jnp.asarray(rng.standard_normal((1, 8, 16, 4)).astype(
        np.float32))
    nxt = jnp.asarray(rng.standard_normal((1, 8, 16, 4)).astype(
        np.float32))

    def loss_pallas(p, n):
        return jnp.sum(
            cost_volume_pallas(p, n, 4, 8, True) ** 2
        )

    def loss_xla(p, n):
        return jnp.sum(cost_volume_xla(p, n, 4) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(prv, nxt)
    gx = jax.grad(loss_xla, argnums=(0, 1))(prv, nxt)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                               atol=1e-3, rtol=1e-3)
