"""Fused Pallas encoder-stem kernel (ops/pallas/stem_kernel.py):
equality vs the exact DownConv composition, gradients of the trainable
wrapper, and the in-model stem_stages wiring.

Reference semantics under test: DownConv = Conv3x3/s2+Mish ->
Conv3x3+Mish -> Conv3x3+Mish (qpwcnet/core/layers.py:498-571), SAME
padding, no normalizer (encoder config, pwcnet.py:142-146). All runs
here are CPU interpret mode (tests/conftest.py forces the CPU
backend); compiled-kernel equality on real TPU is covered by the bench
equality stage and artifacts/ab_stem.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpwcnet_tpu.models.blocks import DownConv
from qpwcnet_tpu.ops.pallas.stem_kernel import (
    downconv_stage_pallas,
    downconv_stage_trainable,
)


def _stage(h, w, cin, cout, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, h, w, cin).astype(np.float32))
    m = DownConv(cout, use_normalizer=False, dtype=jnp.float32)
    v = m.init(jax.random.key(seed + 1), x)
    return m, v, x


@pytest.mark.parametrize(
    "h,w,cin,cout,tr",
    [
        (16, 24, 3, 16, 8),     # multi-tile
        (32, 64, 3, 16, 32),    # single tile
        (28, 64, 16, 32, 32),   # tile larger than output rows
        (64, 48, 3, 16, 16),    # partial last tile (32 rows, tr=16)
    ],
)
def test_stem_stage_matches_downconv(h, w, cin, cout, tr):
    m, v, x = _stage(h, w, cin, cout)
    ref = m.apply(v, x)
    got = downconv_stage_pallas(x, v["params"], dtype=jnp.float32,
                                tile_rows=tr, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_stem_trainable_gradients_match():
    m, v, x = _stage(16, 24, 3, 16, seed=3)

    def loss_ref(p, x):
        return jnp.sum(jnp.sin(m.apply({"params": p}, x)))

    def loss_fused(p, x):
        return jnp.sum(jnp.sin(downconv_stage_trainable(
            x, p, dtype=jnp.float32, tile_rows=8, interpret=True)))

    gr = jax.grad(loss_ref, (0, 1))(v["params"], x)
    gf = jax.grad(loss_fused, (0, 1))(v["params"], x)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               atol=1e-5)
    for a, b in zip(jax.tree.leaves(gr[0]), jax.tree.leaves(gf[0])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4)


@pytest.mark.slow
def test_stem_stages_in_model():
    """Encoder features with stem_stages=2 equal the exact path (the
    flow outputs are vacuous for this check — fresh zero-init heads
    output exactly zero either way)."""
    from qpwcnet_tpu.models import build_flow_net

    rng = np.random.RandomState(0)
    x3 = jnp.asarray(
        rng.uniform(-0.5, 0.5, (1, 64, 128, 3)).astype(np.float32))
    m0, v = build_flow_net(jax.random.key(0), (64, 128), cv_impl="xla")

    def enc(m, img):
        return m.encoder(img, train=False)

    f_ref = m0.apply(v, x3, method=enc)
    f_got = m0.clone(stem_stages=2).apply(v, x3, method=enc)
    assert len(f_ref) == len(f_got) == 6
    for a, b in zip(f_ref, f_got):
        np.testing.assert_allclose(np.asarray(b, np.float32),
                                   np.asarray(a, np.float32), atol=1e-5)


@pytest.mark.slow
def test_stem_stages_rejects_quant_and_spatial():
    from qpwcnet_tpu.models import build_flow_net
    from qpwcnet_tpu.quantize import QuantConfig

    with pytest.raises(ValueError):
        build_flow_net(jax.random.key(0), (64, 128),
                       quant=QuantConfig(mode="int8"), stem_stages=1)
