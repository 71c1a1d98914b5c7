"""Tests for resize, flow_vis, occlusion, and activations ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qpwcnet_tpu.ops.activations import mish, leaky_relu
from qpwcnet_tpu.ops.resize import (
    upsample2x_bilinear,
    avg_pool_2x,
    block_mean_downsample,
    resize_bilinear,
)
from qpwcnet_tpu.ops.flow_vis import flow_to_image, hsv_to_rgb
from qpwcnet_tpu.ops.occlusion import estimate_occlusion_map, invert_flow


def test_mish_values():
    x = np.array([-5.0, -1.0, 0.0, 1.0, 5.0], np.float32)
    want = x * np.tanh(np.log1p(np.exp(x)))
    np.testing.assert_allclose(np.asarray(mish(jnp.asarray(x))), want,
                               atol=5e-4)


def test_mish_single_exp_form_matches_textbook():
    """The one-transcendental form ((t²+2t)/(t²+2t+2), t=e^x) must match
    x*tanh(softplus(x)) to ~ulp across the full range, stay finite past
    the large-x cutoff, and keep finite gradients everywhere."""
    x = np.linspace(-40.0, 40.0, 4001).astype(np.float32)
    want = (x.astype(np.float64)
            * np.tanh(np.log1p(np.exp(x.astype(np.float64)))))
    got = np.asarray(mish(jnp.asarray(x)), np.float64)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)

    g = np.asarray(jax.vmap(jax.grad(mish))(jnp.asarray(x)))
    assert np.all(np.isfinite(g))
    # d(mish)/dx -> 1 for large x, -> 0 for very negative x
    np.testing.assert_allclose(g[-1], 1.0, atol=1e-6)
    np.testing.assert_allclose(g[0], 0.0, atol=1e-6)


def test_leaky_relu_slope():
    x = np.array([-2.0, 3.0], np.float32)
    np.testing.assert_allclose(
        np.asarray(leaky_relu(jnp.asarray(x))), [-0.2, 3.0], atol=1e-7
    )


def test_upsample2x_shapes_and_scale():
    x = np.ones((1, 4, 6, 2), np.float32)
    y = np.asarray(upsample2x_bilinear(jnp.asarray(x), scale=2.0))
    assert y.shape == (1, 8, 12, 2)
    np.testing.assert_allclose(y, 2.0, atol=1e-6)


def test_avg_pool_2x():
    x = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    y = np.asarray(avg_pool_2x(jnp.asarray(x)))
    assert y.shape == (1, 2, 2, 1)
    np.testing.assert_allclose(y[0, 0, 0, 0], (0 + 1 + 4 + 5) / 4.0)


def test_block_mean_downsample():
    x = np.arange(8, dtype=np.float32).reshape(1, 2, 4, 1)
    y = np.asarray(block_mean_downsample(jnp.asarray(x), 2, 2))
    assert y.shape == (1, 1, 2, 1)
    np.testing.assert_allclose(y[0, 0, :, 0], [(0 + 1 + 4 + 5) / 4.0,
                                               (2 + 3 + 6 + 7) / 4.0])


def test_resize_bilinear_identity():
    x = np.random.RandomState(0).uniform(size=(1, 5, 7, 3)).astype(
        np.float32)
    y = np.asarray(resize_bilinear(jnp.asarray(x), (5, 7)))
    np.testing.assert_allclose(y, x, atol=1e-6)


def test_hsv_to_rgb_primaries():
    hsv = np.array(
        [[[0.0, 1.0, 1.0], [1 / 3, 1.0, 1.0], [2 / 3, 1.0, 1.0],
          [0.0, 0.0, 1.0]]],
        np.float32,
    )
    rgb = np.asarray(hsv_to_rgb(jnp.asarray(hsv)))
    np.testing.assert_allclose(rgb[0, 0], [1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(rgb[0, 1], [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(rgb[0, 2], [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(rgb[0, 3], [1, 1, 1], atol=1e-5)


def test_flow_to_image_range():
    rng = np.random.RandomState(0)
    flow = rng.uniform(-5, 5, size=(2, 16, 16, 2)).astype(np.float32)
    img = np.asarray(flow_to_image(jnp.asarray(flow)))
    assert img.shape == (2, 16, 16, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0 + 1e-6


def test_invert_flow_uniform():
    """For constant flow, the naive inverse is the negated flow."""
    flow = np.full((1, 16, 16, 2), 2.0, np.float32)
    inv = np.asarray(invert_flow(jnp.asarray(flow)))
    # interior (border clamping distorts edges)
    np.testing.assert_allclose(inv[0, 4:-4, 4:-4], -2.0, atol=1e-5)


def test_occlusion_oob():
    """Uniform flow pushing right by 8: the right 8 columns of the next
    frame can't be reached -> occluded; also all pixels whose advected
    position leaves the frame are flagged."""
    h = w = 16
    flow = np.zeros((1, h, w, 2), np.float32)
    flow[..., 0] = 8.0
    occ = np.asarray(estimate_occlusion_map(jnp.asarray(flow)))
    assert occ.shape == (1, h, w)
    # pixels with j + 8 >= w are out of bounds
    assert occ[0, :, w - 1].min() == pytest.approx(1.0)
    assert occ[0, :, w - 8:].min() == pytest.approx(1.0)
    # leftmost columns are covered by the inverse scatter
    assert occ[0, 4, 2] == pytest.approx(0.0)
