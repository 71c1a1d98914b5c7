"""Fused Pallas UpConv (transpose-conv) kernel
(ops/pallas/upconv_kernel.py): equality vs the exact QConvTranspose
composition (lax.conv_transpose 4x4/s2 SAME + bias + Mish,
qpwcnet/core/layers.py:255-282), trainable-wrapper gradients, and the
in-model Decoder wiring. CPU interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpwcnet_tpu.models.blocks import UpConv
from qpwcnet_tpu.ops.pallas.upconv_kernel import (
    upconv_stage_pallas,
    upconv_stage_trainable,
)


def _stage(h, w, ci, co, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, h, w, ci).astype(np.float32))
    m = UpConv(co, dtype=jnp.float32)
    v = m.init(jax.random.key(seed + 1), x)
    return m, v, x


@pytest.mark.parametrize(
    "h,w,ci,co,tr",
    [
        (8, 12, 6, 4, 8),      # single tile
        (14, 32, 64, 16, 8),   # multi-tile, odd-ish H
        (16, 24, 3, 16, 16),
    ],
)
def test_upconv_stage_matches_conv_transpose(h, w, ci, co, tr):
    m, v, x = _stage(h, w, ci, co)
    ref = m.apply(v, x)
    got = upconv_stage_pallas(x, v["params"], dtype=jnp.float32,
                              tile_rows=tr, interpret=True)
    assert got.shape == ref.shape == (2, 2 * h, 2 * w, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_upconv_trainable_gradients_match():
    m, v, x = _stage(8, 12, 6, 4, seed=3)

    def loss_ref(p, x):
        return jnp.sum(jnp.sin(m.apply({"params": p}, x)))

    def loss_fused(p, x):
        return jnp.sum(jnp.sin(upconv_stage_trainable(
            x, p, dtype=jnp.float32, tile_rows=8, interpret=True)))

    gr = jax.grad(loss_ref, (0, 1))(v["params"], x)
    gf = jax.grad(loss_fused, (0, 1))(v["params"], x)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               atol=1e-5)
    for a, b in zip(jax.tree.leaves(gr[0]), jax.tree.leaves(gf[0])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4)


@pytest.mark.slow
def test_upconv_stages_in_model():
    from qpwcnet_tpu.models import build_flow_net

    rng = np.random.RandomState(0)
    x3 = jnp.asarray(
        rng.uniform(-0.5, 0.5, (1, 64, 128, 3)).astype(np.float32))
    m0, v = build_flow_net(jax.random.key(0), (64, 128), cv_impl="xla")

    def decs(m, img):
        return m.decoder(m.encoder(img, train=False), train=False)

    d_ref = m0.apply(v, x3, method=decs)
    d_got = m0.clone(upconv_stages=2).apply(v, x3, method=decs)
    assert len(d_ref) == len(d_got) == 4
    for a, b in zip(d_ref, d_got):
        np.testing.assert_allclose(np.asarray(b, np.float32),
                                   np.asarray(a, np.float32), atol=1e-5)
