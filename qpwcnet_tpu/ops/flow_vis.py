"""Flow visualization and cost-volume decoding (port of qpwcnet/core/vis.py).

Pure jnp — usable on host or device. NHWC only.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    """HSV -> RGB, channels in the last axis, all in [0, 1]."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6

    rgb = jnp.stack(
        [
            jnp.select(
                [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                [v, q, p, p, t, v],
            ),
            jnp.select(
                [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                [t, v, v, q, p, p],
            ),
            jnp.select(
                [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                [p, p, t, v, v, q],
            ),
        ],
        axis=-1,
    )
    return rgb


def flow_to_image(flow: jax.Array) -> jax.Array:
    """Colorize flow: angle->hue, magnitude/max->saturation, V=1
    (qpwcnet/core/vis.py:37-76).

    flow: (..., H, W, 2) in (x, y) order -> (..., H, W, 3) RGB in [0, 1].
    """
    ang = jnp.arctan2(flow[..., 1], flow[..., 0])
    h = (ang + math.pi) / (2.0 * math.pi)

    mag = jnp.linalg.norm(flow, axis=-1)
    smax = jnp.max(mag, axis=(-2, -1), keepdims=True)
    s = mag / (smax + 1e-6)
    v = jnp.ones_like(h)

    hsv = jnp.stack([h, s, v], axis=-1)
    return hsv_to_rgb(hsv)


def cost_volume_to_flow(cvol: jax.Array) -> jax.Array:
    """Decode flow directly from a cost volume by correlation argmax
    (qpwcnet/core/vis.py:9-34).

    cvol: (..., H, W, d*d) -> (..., H, W, 2) in (di, dj) == (y, x)-delta
    order stacked on the last axis, matching the reference's output
    ``tf.stack([di, dj], axis)``.
    """
    dims = cvol.shape[-1]
    imax = jnp.argmax(cvol, axis=-1).astype(jnp.float32)
    q = math.isqrt(dims)
    assert q * q == dims, dims
    di = jnp.floor(imax / q)
    dj = imax - di * q
    di = di - (q - 1) / 2.0
    dj = dj - (q - 1) / 2.0
    return jnp.stack([di, dj], axis=-1)
