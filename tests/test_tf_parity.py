"""Cross-validation against the ACTUAL TensorFlow ops the reference
calls (slow: imports TF). These pin the numerics-parity claims of
ops/resize.py, data/augment.py, and train/losses.py to the original
implementations rather than to our own reading of them.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _rand(shape, seed=0, lo=0.0, hi=1.0):
    return np.random.RandomState(seed).uniform(
        lo, hi, shape).astype(np.float32)


def test_resize_bilinear_matches_tf():
    from qpwcnet_tpu.ops.resize import resize_bilinear

    x = _rand((2, 13, 17, 3))
    got = np.asarray(resize_bilinear(jnp.asarray(x), (26, 40)))
    want = tf.image.resize(x, (26, 40), method="bilinear").numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_upsample2x_matches_keras_upsampling2d():
    from qpwcnet_tpu.ops.resize import upsample2x_bilinear

    x = _rand((1, 6, 9, 2), seed=1)
    got = np.asarray(upsample2x_bilinear(jnp.asarray(x)))
    layer = tf.keras.layers.UpSampling2D(interpolation="bilinear")
    want = layer(x).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_avg_pool_matches_keras():
    from qpwcnet_tpu.ops.resize import avg_pool_2x

    x = _rand((1, 8, 12, 3), seed=2)
    got = np.asarray(avg_pool_2x(jnp.asarray(x)))
    layer = tf.keras.layers.AvgPool2D(pool_size=(2, 2), padding="same")
    want = layer(x).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_color_ops_match_tf_image():
    from qpwcnet_tpu.data.augment import (
        adjust_brightness, adjust_contrast, adjust_hue,
        adjust_saturation)

    img = _rand((6, 8, 3), seed=3, lo=0.05, hi=0.95)
    j = jnp.asarray(img)

    np.testing.assert_allclose(
        np.asarray(adjust_brightness(j, 0.1)),
        tf.image.adjust_brightness(img, 0.1).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(adjust_contrast(j, 1.3)),
        tf.image.adjust_contrast(img, 1.3).numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(adjust_saturation(j, 0.7)),
        tf.image.adjust_saturation(img, 0.7).numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(adjust_hue(j, 0.15)),
        tf.image.adjust_hue(img, 0.15).numpy(), atol=1e-4)


def test_huber_matches_keras():
    from qpwcnet_tpu.train.losses import _huber

    err = np.random.RandomState(4).uniform(
        -0.5, 0.5, (4, 5)).astype(np.float32)
    got = float(jnp.mean(_huber(jnp.asarray(err), 0.1)))
    keras_h = tf.keras.losses.Huber(delta=0.1)
    want = float(keras_h(err, np.zeros_like(err)).numpy())
    assert got == pytest.approx(want, rel=1e-5)


def test_mish_matches_tf():
    from qpwcnet_tpu.ops.activations import mish

    x = np.linspace(-6, 6, 31, dtype=np.float32)
    got = np.asarray(mish(jnp.asarray(x)))
    want = (x * tf.math.tanh(tf.math.softplus(x))).numpy()
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_hsv_roundtrip_matches_tf():
    from qpwcnet_tpu.data.augment import rgb_to_hsv
    from qpwcnet_tpu.ops.flow_vis import hsv_to_rgb

    img = _rand((5, 7, 3), seed=5, lo=0.0, hi=1.0)
    got_hsv = np.asarray(rgb_to_hsv(jnp.asarray(img)))
    want_hsv = tf.image.rgb_to_hsv(img).numpy()
    np.testing.assert_allclose(got_hsv, want_hsv, atol=1e-5)
    got_rgb = np.asarray(hsv_to_rgb(jnp.asarray(want_hsv)))
    want_rgb = tf.image.hsv_to_rgb(want_hsv).numpy()
    np.testing.assert_allclose(got_rgb, want_rgb, atol=1e-5)
