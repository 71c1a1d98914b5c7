"""Interpolator flow-extraction and multihost-helper tests."""

import jax
import jax.numpy as jnp
import numpy as np

from qpwcnet_tpu.parallel import make_global_batch, make_mesh


def test_interpolator_return_flows(interp_setup):
    """return_flows exposes the bidirectional multiscale flows — the
    reference extracted these by Keras layer name (pre_train_test.py:
    102-106)."""
    from tests.conftest import TEST_HW

    h, w = TEST_HW
    model, variables = interp_setup
    x = jnp.zeros((1, h, w, 6), jnp.float32)
    out, (flos_01, flos_10) = model.apply(
        variables, x, train=False, return_flows=True)
    assert out.shape == (1, h, w, 3)
    assert len(flos_01) == 6 and len(flos_10) == 6
    assert flos_01[-1].shape == (1, h, w, 2)
    assert flos_10[0].shape == (1, h // 32, w // 32, 2)


def test_make_global_batch_single_process():
    mesh = make_mesh()
    n = mesh.devices.shape[0]
    batch = {"x": np.arange(n * 2, dtype=np.float32).reshape(n, 2)}
    g = make_global_batch(batch, mesh)
    assert g["x"].shape == (n, 2)
    np.testing.assert_array_equal(np.asarray(g["x"]), batch["x"])
