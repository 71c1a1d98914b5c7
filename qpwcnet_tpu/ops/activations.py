"""Activation functions.

Mish parity with the reference (qpwcnet/core/mish.py:27-28):
``mish(x) = x * tanh(softplus(x))``. The reference registers it as a Keras
custom activation; here it is a plain function usable inside jitted code.
"""

import jax
import jax.numpy as jnp


def mish(x: jax.Array) -> jax.Array:
    """Mish activation: ``x * tanh(softplus(x))``.

    Computed via the algebraic identity (with ``t = e^x``)::

        tanh(ln(1 + t)) = ((1+t)² - 1) / ((1+t)² + 1) = (t² + 2t) / (t² + 2t + 2)

    which needs ONE transcendental (exp) plus a reciprocal instead of
    three (exp, log1p, tanh) — Mish runs after every conv in this model
    family (it is the VPU-bound tail of each fused conv kernel), so the
    transcendental count matters. Values match the textbook
    ``x * tanh(softplus(x))`` to ~1 ulp in f32 (tests/test_ops_misc.py);
    above the cutoff 20, ``tanh(softplus(x)) = 1`` exactly in f32
    (1 - tanh(softplus(20)) < 1e-17), and clamping the exp argument also
    keeps the untaken branch finite for autodiff (no inf²/inf²).
    """
    xc = jnp.minimum(x.astype(jnp.float32), 20.0)
    t = jnp.exp(xc)
    y = (t * t + 2.0 * t) / (t * t + 2.0 * t + 2.0)
    return x * jnp.where(x.astype(jnp.float32) > 20.0,
                         1.0, y).astype(x.dtype)


def leaky_relu(x: jax.Array, negative_slope: float = 0.1) -> jax.Array:
    """Leaky ReLU with the reference's default slope of 0.1
    (qpwcnet/core/layers.py:15-16)."""
    return jax.nn.leaky_relu(x, negative_slope=negative_slope)
