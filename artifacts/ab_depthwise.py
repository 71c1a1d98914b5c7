"""A/B the depthwise-conv FORWARD at the finest-UpFlow shapes.

Hypothesis (round 4): UpFlow level times scale with PIXELS, not bytes
(2.0/4.8/13.7/41 ms while bytes only double per level), pointing at a
per-pixel channel-independent cost. The OptFlow head's depthwise convs
(feature_group_count=C) are the candidate: XLA:TPU's grouped-conv
emitter may be as pathological FORWARD at large C as its backward was
(DESIGN.md round-2 finding #2). Compare:

  a) lax depthwise conv (current _depthwise_conv forward),
  b) 9-tap shift-multiply-add (pure VPU elementwise, pad+slice),
  c) dense 3x3 conv at same channels (MXU reference point).

Run FOREGROUND on the axon TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python artifacts/ab_depthwise.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def dw_lax(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def dw_taps(x, k):
    """Depthwise 3x3 as 9 shifted elementwise FMAs (VPU path)."""
    kh, kw = k.shape[:2]
    ph, pw = kh // 2, kw // 2
    h, w = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    out = None
    for u in range(kh):
        for v in range(kw):
            t = xp[:, u:u + h, v:v + w, :] * k[u, v, 0]
            out = t if out is None else out + t
    return out


def main():
    from qpwcnet_tpu.utils.compile_cache import enable_compile_cache
    from qpwcnet_tpu.utils.profiling import time_fn_chained

    enable_compile_cache()
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    log(f"backend={jax.default_backend()} dtype={dtype.__name__}")

    # OptFlow-head shapes at the finest two UpFlow levels (448x1024 b8).
    for b, h, w, c in [(8, 224, 512, 99), (8, 224, 512, 128),
                       (8, 112, 256, 115)]:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)).astype(
            dtype)
        k = jnp.asarray(
            rng.randn(3, 3, 1, c).astype(np.float32)).astype(dtype)
        kd = jnp.asarray(
            rng.randn(3, 3, c, c).astype(np.float32) / c).astype(dtype)

        fa = jax.jit(lambda a: dw_lax(a, k))
        fb = jax.jit(lambda a: dw_taps(a, k))
        fc = jax.jit(lambda a: jax.lax.conv_general_dilated(
            a, kd, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))

        d = float(jnp.max(jnp.abs(
            fa(x).astype(jnp.float32) - fb(x).astype(jnp.float32))))
        ta = time_fn_chained(fa, x, iters=10) * 1e3
        tb = time_fn_chained(fb, x, iters=10) * 1e3
        tc = time_fn_chained(fc, x, iters=10) * 1e3
        log(f"({b},{h},{w},{c}): lax_dw {ta:.2f} ms | taps {tb:.2f} ms "
            f"| dense {tc:.2f} ms | taps-vs-lax diff {d:.2e}")


if __name__ == "__main__":
    main()
