"""Activation functions.

Mish parity with the reference (qpwcnet/core/mish.py:27-28):
``mish(x) = x * tanh(softplus(x))``. The reference registers it as a Keras
custom activation; here it is a plain function usable inside jitted code.
"""

import jax
import jax.numpy as jnp


def mish(x: jax.Array) -> jax.Array:
    """Mish activation: ``x * tanh(softplus(x))``.

    softplus is computed in a numerically-stable way by jax.nn.softplus;
    for bf16 inputs the tanh/softplus run in the input dtype (fine on VPU).
    """
    return x * jnp.tanh(jax.nn.softplus(x))


def leaky_relu(x: jax.Array, negative_slope: float = 0.1) -> jax.Array:
    """Leaky ReLU with the reference's default slope of 0.1
    (qpwcnet/core/layers.py:15-16)."""
    return jax.nn.leaky_relu(x, negative_slope=negative_slope)
