"""Spatial resizing primitives.

Parity notes (all NHWC):
  * :func:`upsample2x_bilinear` matches the reference ``Upsample``
    (tf.keras.layers.UpSampling2D(interpolation='bilinear') * scale,
    qpwcnet/core/layers.py:231-243): TF2 bilinear resize uses half-pixel
    centers, as does ``jax.image.resize(method='bilinear')``. The ``scale``
    multiplier doubles flow magnitude when upsampling flow between pyramid
    levels (scale=2.0) — including the final level (the reference's
    ``sacle=2.0`` typo at non_layers.py:468 is deliberately fixed; see
    SURVEY.md §2.1).
  * :func:`avg_pool_2x` matches tf.keras.layers.AvgPool2D(pool_size=2,
    padding='same') used for the interpolator image pyramid
    (qpwcnet/core/layers.py:219-228).
  * :func:`block_mean_downsample` matches the einops block-mean reduction in
    FlowMseLossV2 (qpwcnet/train/loss.py:160-173); exact integer factors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize to (H', W') with half-pixel centers (TF2-compatible).

    x: (B, H, W, C) -> (B, H', W', C).
    """
    b, _, _, c = x.shape
    return jax.image.resize(
        x, (b, out_hw[0], out_hw[1], c), method="bilinear"
    )


def upsample2x_bilinear(x: jax.Array, scale: float = 1.0) -> jax.Array:
    """2x bilinear upsampling times a scalar (2.0 doubles flow magnitude)."""
    b, h, w, c = x.shape
    y = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")
    if scale != 1.0:
        y = y * jnp.asarray(scale, dtype=x.dtype)
    return y


def avg_pool_2x(x: jax.Array) -> jax.Array:
    """2x2 average pool, stride 2, 'same' padding (ceil output size)."""
    b, h, w, c = x.shape
    # 'same' padding for pool 2 stride 2: pad bottom/right by (h % 2, w % 2).
    # TF 'same' avg-pool divides by the count of *valid* (non-padded)
    # elements in each window; with even inputs (the only case the models
    # hit — all pyramid dims are multiples of 32) plain mean is exact.
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        h, w = h + ph, w + pw
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def block_mean_downsample(x: jax.Array, sh: int, sw: int) -> jax.Array:
    """Exact block-mean pooling by integer factors (sh, sw)."""
    b, h, w, c = x.shape
    assert h % sh == 0 and w % sw == 0, (h, w, sh, sw)
    return x.reshape(b, h // sh, sh, w // sw, sw, c).mean(axis=(2, 4))
