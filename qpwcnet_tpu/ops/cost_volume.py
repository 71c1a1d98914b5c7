"""Cost-volume correlation (81-offset displacement search).

Semantics (parity with the reference's composed-op ``CostVolume``,
qpwcnet/core/layers.py:72-100, and the tfa CUDA op ``CostVolumeV2``,
layers.py:112-132 — the reference asserts their equality in
test/test_cost_volume.py):

With search range ``r`` (default 4) and displacement count ``d = 2r+1``::

    out[b, i, j, k] = leaky_relu_{0.1}(
        mean_c( prv[b, i, j, c] * nxt[b, i + di, j + dj, c] ) )

where ``k = (di + r) * d + (dj + r)`` (row-major over (di, dj); di indexes
the height axis) and ``nxt`` is zero-padded outside its bounds. Output has
``d*d`` channels (81 for r=4).

Two implementations behind one API:
  * :func:`cost_volume_xla` — statically-unrolled shift-and-multiply on a
    zero-padded ``nxt``; XLA fuses the 81 slices into one loop nest.
  * A fused Pallas kernel (``qpwcnet_tpu.ops.pallas.cost_volume_kernel``)
    that keeps the prv tile and the haloed nxt tile VMEM-resident,
    eliminating the repeated HBM reads. Selected via ``impl='pallas'``.

:func:`cost_volume` dispatches between them (default: pallas on TPU, xla
elsewhere).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from qpwcnet_tpu.ops.activations import leaky_relu


def cost_volume_xla(
    prv: jax.Array, nxt: jax.Array, search_range: int = 4
) -> jax.Array:
    """Reference XLA formulation: pad + 81 static shifts.

    Args:
      prv, nxt: (B, H, W, C) feature maps.
    Returns:
      (B, H, W, (2r+1)**2) cost volume after leaky_relu(0.1).
    """
    r = search_range
    d = 2 * r + 1
    b, h, w, c = prv.shape
    acc_dtype = jnp.float32

    prv32 = prv.astype(acc_dtype)
    pad_nxt = jnp.pad(
        nxt.astype(acc_dtype), ((0, 0), (r, r), (r, r), (0, 0))
    )

    inv_c = 1.0 / c
    costs = []
    for i0 in range(d):
        for j0 in range(d):
            roi = jax.lax.slice(
                pad_nxt, (0, i0, j0, 0), (b, i0 + h, j0 + w, c)
            )
            costs.append(jnp.sum(prv32 * roi, axis=-1) * inv_c)
    # Stack on a LEADING axis then transpose to NHWC. Stacking on the
    # trailing axis makes XLA:TPU materialize 81 f32[B,H,W,1] temps each
    # lane-padded 128x (observed 36 GB HBM for 8x448x1024 inputs);
    # leading-axis stacking keeps (H, W) on the (sublane, lane) tiles.
    cvol = jnp.stack(costs, axis=1)  # (B, d*d, H, W)
    return leaky_relu(cvol, 0.1).astype(prv.dtype).transpose(0, 2, 3, 1)


def cost_volume_xla_haloed(
    prv: jax.Array, nxt_h: jax.Array, search_range: int = 4
) -> jax.Array:
    """:func:`cost_volume_xla` with the H halo supplied by the caller:
    ``nxt_h`` is (B, H + 2r, W, C) with rows [r, H + r) aligned to prv
    (the spatial-sharding fast path exchanges those rows between shards
    instead of zero-padding; qpwcnet_tpu.parallel.spatial_ops)."""
    r = search_range
    d = 2 * r + 1
    b, h, w, c = prv.shape
    acc_dtype = jnp.float32

    prv32 = prv.astype(acc_dtype)
    pad_nxt = jnp.pad(
        nxt_h.astype(acc_dtype), ((0, 0), (0, 0), (r, r), (0, 0))
    )

    inv_c = 1.0 / c
    costs = []
    for i0 in range(d):
        for j0 in range(d):
            roi = jax.lax.slice(
                pad_nxt, (0, i0, j0, 0), (b, i0 + h, j0 + w, c)
            )
            costs.append(jnp.sum(prv32 * roi, axis=-1) * inv_c)
    cvol = jnp.stack(costs, axis=1)  # (B, d*d, H, W)
    return leaky_relu(cvol, 0.1).astype(prv.dtype).transpose(0, 2, 3, 1)


@functools.partial(jax.jit, static_argnames=("search_range", "impl"))
def cost_volume(
    prv: jax.Array,
    nxt: jax.Array,
    search_range: int = 4,
    impl: str = "auto",
) -> jax.Array:
    """Cost-volume correlation with implementation dispatch.

    impl: 'auto' | 'xla' | 'pallas'. 'auto' picks the Pallas kernel on TPU
    backends and the XLA formulation otherwise.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "fused":
        # 'fused' selects the fused warp+correlate kernel at the WARP
        # sites (models/blocks.py:UpFlowBlock, inference only); plain
        # warp-free cost volumes (FlowBlock, and every site during
        # training) use the Pallas kernel.
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from qpwcnet_tpu.ops.pallas.cost_volume_kernel import (
            cost_volume_pallas,
        )

        return cost_volume_pallas(prv, nxt, search_range=search_range)
    if impl == "xla":
        return cost_volume_xla(prv, nxt, search_range=search_range)
    raise ValueError(f"unknown cost_volume impl: {impl!r}")
