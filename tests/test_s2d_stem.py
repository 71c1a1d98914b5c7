"""Space-to-depth stem spelling (qlayers._s2d_conv): exact equivalence
to the plain 3x3/stride-2 SAME conv, at the op level and in-model.

The s2d form exists purely for XLA:TPU layout reasons (the low-C stem
convs otherwise cost GB-scale relayout copies — VERDICT r4 #1); it must
be numerically a re-spelling, not an approximation, so that checkpoints
and training dynamics are identical in both formulations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpwcnet_tpu.quantize.qlayers import _s2d_conv


def _plain_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape,cin,cout", [
    ((2, 16, 24, 3), 3, 16),
    ((1, 32, 32, 16), 16, 32),
])
def test_s2d_conv_equals_plain(shape, cin, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
    np.testing.assert_allclose(
        np.asarray(_s2d_conv(x, k)), np.asarray(_plain_conv(x, k)),
        rtol=1e-5, atol=1e-5)


def test_s2d_conv_grads_equal():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 8).astype(np.float32) * 0.1)

    def loss(conv):
        return lambda x, k: jnp.sum(jnp.sin(conv(x, k)))

    gx_s, gk_s = jax.grad(loss(_s2d_conv), (0, 1))(x, k)
    gx_p, gk_p = jax.grad(loss(_plain_conv), (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_s), np.asarray(gk_p),
                               rtol=1e-5, atol=1e-5)


def test_model_forward_identical_with_s2d_stages():
    """Same params, same input: s2d_stages=0 vs 2 forwards are equal
    (bit-for-bit up to XLA fusion noise) — the param tree is shared, so
    checkpoints transfer between formulations."""
    from qpwcnet_tpu.models import build_flow_net

    model0, variables = build_flow_net(
        jax.random.key(0), (64, 128), cv_impl="xla")
    model2 = model0.clone(s2d_stages=2)
    x = jnp.asarray(np.random.RandomState(2).uniform(
        -0.5, 0.5, (1, 64, 128, 6)).astype(np.float32))
    out0 = model0.apply(variables, x, train=False)
    out2 = model2.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out2),
                               rtol=1e-4, atol=1e-4)
