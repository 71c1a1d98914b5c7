"""Occlusion-map estimation and naive flow inversion
(port of qpwcnet/core/occlusion.py).

Flow convention: see qpwcnet_tpu.ops.warp — (x, y) channel order,
``prv[i, j] == nxt[i + flow_y, j + flow_x]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qpwcnet_tpu.ops.warp import backward_warp


def invert_flow(flow: jax.Array) -> jax.Array:
    """Naive inverse flow ``-warp(flow, flow)``
    (qpwcnet/core/occlusion.py:83; assumption: larger flow = closer)."""
    return -backward_warp(flow, flow)


def estimate_occlusion_map(flow: jax.Array) -> jax.Array:
    """Estimate which pixels of the *next* frame are unobservable from the
    previous frame under ``flow`` (qpwcnet/core/occlusion.py:27-118).

    A pixel is marked occluded (1.0) when (a) its forward-advected position
    leaves the image, or (b) no inverse-flow-advected source cell lands on
    it ("holes" found by scattering zeros into a ones-map at
    inverse-warped integer positions).

    flow: (B, H, W, 2) -> (B, H, W) float mask in {0.0, 1.0}.
    """
    b, h, w, _ = flow.shape
    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)

    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[None]
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[None]

    i2 = gy + fy
    j2 = gx + fx
    oob = (i2 < 0) | (i2 >= h) | (j2 < 0) | (j2 >= w)
    oob = oob.astype(jnp.float32)

    inv = invert_flow(flow)
    i3 = jnp.clip((gy + inv[..., 1]).astype(jnp.int32), 0, h - 1)
    j3 = jnp.clip((gx + inv[..., 0]).astype(jnp.int32), 0, w - 1)

    bidx = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 0)
    lin = (bidx * (h * w) + i3 * w + j3).reshape(-1)
    map3 = (
        jnp.ones((b * h * w,), dtype=jnp.float32)
        .at[lin]
        .min(jnp.zeros_like(lin, dtype=jnp.float32))
        .reshape(b, h, w)
    )
    return jnp.maximum(oob, map3)
