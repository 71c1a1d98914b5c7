"""Flow-aware data augmentation — ON DEVICE, jit-friendly
(port of qpwcnet/data/augment.py + triplet_dataset_ops.py:20-54).

TPU-first redesign: the reference ran augmentation inside tf.data on CPU
threads; here every op is a pure jax function with STATIC output shapes,
so the whole augmentation chain fuses into the jitted train step and runs
on the TPU. The random scale-and-crop (augment.py:117-142: resize by a
random scale then random-crop a fixed window) is expressed as a single
``jax.image.scale_and_translate`` — one fused gather instead of a
dynamic-shape resize, which XLA cannot compile.

Semantics preserved:
  * flips carry the flow-component sign fix (augment.py:83-114);
  * scale ∈ base*[0.955, 1.05], flow magnitudes scaled by the same factor
    (augment.py:117-142);
  * color: brightness/saturation/hue/contrast applied with the SAME draw
    to both frames of a pair (augment.py:62-80);
  * triplet aug (triplet_dataset_ops.py:20-54): photometric 3D rotation
    of RGB vectors + log-scale + offset (augment.py:37-59), additive
    gaussian noise sigma=0.02, LR/UD flips applied identically to all
    three frames, per-sample randomness across the batch.

All images float32 in [0, 1] (shift to [-0.5, 0.5] happens in the
preprocessing step, matching train.py:71-94).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from qpwcnet_tpu.ops.flow_vis import hsv_to_rgb


# ------------------------------------------------------------ color space

def rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    diff = mx - mn
    safe = jnp.where(diff > 0, diff, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe % 6.0,
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
    )
    h = jnp.where(diff > 0, h / 6.0, 0.0)
    s = jnp.where(mx > 0, diff / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def adjust_brightness(img, delta):
    return img + delta


def adjust_saturation(img, factor):
    hsv = rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * factor, 0.0, 1.0))
    return hsv_to_rgb(hsv)


def adjust_hue(img, delta):
    hsv = rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    hsv = hsv.at[..., 0].set((hsv[..., 0] + delta) % 1.0)
    return hsv_to_rgb(hsv)


def adjust_contrast(img, factor):
    mean = jnp.mean(img, axis=(-3, -2), keepdims=True)
    return (img - mean) * factor + mean


# -------------------------------------------------------------- flow pair

def _split_pair(ims6):
    return ims6[..., :3], ims6[..., 3:]


def color_augment_pair(key: jax.Array, ims6: jax.Array) -> jax.Array:
    """brightness/saturation/hue/contrast with one draw per sample,
    identical for both frames (augment.py:62-80). ims6: (H, W, 6)."""
    kb, ks, kh, kc = jax.random.split(key, 4)
    brightness = jax.random.uniform(kb, (), minval=-0.125, maxval=0.125)
    saturation = jax.random.uniform(ks, (), minval=0.5, maxval=1.5)
    hue = jax.random.uniform(kh, (), minval=-0.2, maxval=0.2)
    contrast = jax.random.uniform(kc, (), minval=0.5, maxval=1.5)

    a, b = _split_pair(ims6)
    x = jnp.stack([a, b], 0)
    x = adjust_brightness(x, brightness)
    x = adjust_saturation(x, saturation)
    x = adjust_hue(x, hue)
    x = adjust_contrast(x, contrast)
    return jnp.concatenate([x[0], x[1]], axis=-1)


def flip_ud_pair(key, ims6, flo):
    """Random up-down flip; flow v-component sign fix
    (augment.py:83-97). Single sample (H, W, C)."""
    flip = jax.random.uniform(key, ()) < 0.5
    ims_f = jnp.flip(ims6, axis=0)
    flo_f = jnp.concatenate(
        [jnp.flip(flo[..., :1], axis=0), -jnp.flip(flo[..., 1:], axis=0)],
        axis=-1,
    )
    return (
        jnp.where(flip, ims_f, ims6),
        jnp.where(flip, flo_f, flo),
    )


def flip_lr_pair(key, ims6, flo):
    """Random left-right flip; flow u-component sign fix
    (augment.py:100-114)."""
    flip = jax.random.uniform(key, ()) < 0.5
    ims_f = jnp.flip(ims6, axis=1)
    flo_f = jnp.concatenate(
        [-jnp.flip(flo[..., :1], axis=1), jnp.flip(flo[..., 1:], axis=1)],
        axis=-1,
    )
    return (
        jnp.where(flip, ims_f, ims6),
        jnp.where(flip, flo_f, flo),
    )


def scale_and_crop(key, ims6, flo, out_hw: Tuple[int, int],
                   base_scale: float = 1.0):
    """Random scale in base*[0.955, 1.05] then random crop to out_hw,
    with flow magnitudes scaled (augment.py:117-142). Expressed as ONE
    scale_and_translate gather with static output shape.

    out[y, x] = in((y - ty)/s, (x - tx)/s) where (ty, tx) = -crop offset.
    """
    h, w = ims6.shape[0], ims6.shape[1]
    oh, ow = out_hw
    ks, ky, kx = jax.random.split(key, 3)
    scale = jax.random.uniform(
        ks, (), minval=base_scale * 0.955, maxval=base_scale * 1.05
    )
    # valid crop offsets within the virtually-resized image
    max_oy = jnp.maximum(h * scale - oh, 0.0)
    max_ox = jnp.maximum(w * scale - ow, 0.0)
    oy = jax.random.uniform(ky, ()) * max_oy
    ox = jax.random.uniform(kx, ()) * max_ox

    x = jnp.concatenate([ims6, flo], axis=-1)
    y = jax.image.scale_and_translate(
        x,
        (oh, ow, x.shape[-1]),
        spatial_dims=(0, 1),
        scale=jnp.stack([scale, scale]),
        translation=jnp.stack([-oy, -ox]),
        method="bilinear",
        antialias=False,
    )
    return y[..., :6], y[..., 6:] * scale


def image_augment(key, ims6, flo, out_hw: Tuple[int, int],
                  base_scale: float = 1.0):
    """Full flow-supervised augmentation chain for ONE sample
    (augment.py:167-173): flips -> scale+crop -> color."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ims6, flo = flip_ud_pair(k1, ims6, flo)
    ims6, flo = flip_lr_pair(k2, ims6, flo)
    ims6, flo = scale_and_crop(k3, ims6, flo, out_hw, base_scale)
    ims6 = color_augment_pair(k4, ims6)
    return ims6, flo


@functools.partial(jax.jit, static_argnames=("out_hw", "base_scale"))
def image_augment_batch(key, ims6, flo, out_hw: Tuple[int, int],
                        base_scale: float = 1.0):
    """vmapped per-sample augmentation over a batch; each sample draws
    its own randomness. ims6: (B,H,W,6) f32 [0,1]; flo: (B,H,W,2)."""
    keys = jax.random.split(key, ims6.shape[0])
    return jax.vmap(
        lambda k, i, f: image_augment(k, i, f, out_hw, base_scale)
    )(keys, ims6, flo)


# ---------------------------------------------------------------- triplet

def rotation_matrix_from_euler(angles: jax.Array) -> jax.Array:
    """(..., 3) euler -> (..., 3, 3) rotation (augment.py:10-25)."""
    c, s = jnp.cos(angles), jnp.sin(angles)
    cx, cy, cz = c[..., 0], c[..., 1], c[..., 2]
    sx, sy, sz = s[..., 0], s[..., 1], s[..., 2]
    rows = jnp.stack(
        [
            cy * cz, sx * sy * cz - cx * sz, cx * sy * cz + sx * sz,
            cy * sz, sx * sy * sz + cx * cz, cx * sy * sz - sx * cz,
            -sy, sx * cy, cx * cy,
        ],
        axis=-1,
    )
    return rows.reshape(rows.shape[:-1] + (3, 3))


def photometric_augmentation(key, x: jax.Array, z_shape: Tuple[int, ...],
                             max_txn: float = 0.3, max_rxn: float = 0.3,
                             max_scale: float = 0.3) -> jax.Array:
    """Random 3D rotation applied to RGB vectors + log-space scale +
    offset (augment.py:37-59). x: (..., 3); z_shape broadcasts against
    the leading dims (e.g. (1, B, 1, 1) for per-sample-but-
    triplet-consistent batched augmentation)."""
    kt, kr, ks = jax.random.split(key, 3)
    z_txn = jax.random.uniform(kt, z_shape + (3,), minval=-max_txn,
                               maxval=max_txn)
    z_rxn = jax.random.uniform(kr, z_shape + (3,), minval=-max_rxn,
                               maxval=max_rxn)
    z_scale = jnp.exp(
        jax.random.uniform(ks, z_shape + (3,), minval=-max_scale,
                           maxval=max_scale)
    )
    rot = rotation_matrix_from_euler(z_rxn)
    y = jnp.einsum("...ab,...b->...a", rot, x)
    return y * z_scale + z_txn


@jax.jit
def augment_triplet_batch(key, a, b, c):
    """Batched triplet-consistent augmentation
    (triplet_dataset_ops.py:20-54): photometric (per-sample draw, same
    across the 3 frames), gaussian noise sigma=0.02, LR/UD flips applied
    identically to all frames. a/b/c: (B, H, W, 3) f32 [0,1]."""
    bsz = a.shape[0]
    x = jnp.stack([a, b, c], axis=0)  # (3, B, H, W, 3)

    kp, kn, kud, klr = jax.random.split(key, 4)
    y = photometric_augmentation(kp, x, z_shape=(1, bsz, 1, 1))
    y = y + jax.random.normal(kn, (1, bsz) + x.shape[2:]) * 0.02

    for k, axis in ((kud, 2), (klr, 3)):
        flip = jax.random.uniform(k, (1, bsz, 1, 1, 1)) < 0.5
        y = jnp.where(flip, jnp.flip(y, axis=axis), y)

    return y[0], y[1], y[2]
