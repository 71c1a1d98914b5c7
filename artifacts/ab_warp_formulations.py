"""A/B exact backward-warp formulations on TPU (round 4).

The round-4 fused-kernel A/B (ab_fused_warp_cv.py) revealed the exact
gather warp is index-count-bound: 22.7 ms standalone at the finest
headline level (8,224,512,16) — ~25 ns/index — making it the largest
single cost in the forward AND in both train steps (FrameInterpolate
warps full-res images). This script races exact formulations:

  A. production: ONE lax.gather, slice (1,2,2,C), CLIP   (ops/warp.py)
  B. four take_along_axis corner gathers on flattened HW
  C. jnp.take on flattened B*H*W (batch folded into the index)
  D. two-gather rows-then-lanes: take_along_axis along H (axis=1) for
     y0/y1 with per-pixel row indices, then along W (axis=2)
  E. Pallas VMEM gather: whole source resident in VMEM, per-block
     vectorized take_along_axis inside the kernel (if Mosaic supports)

All exact formulations must agree with A to ~1e-2 (bf16).

Run (axon env):
    PYTHONPATH=/root/.axon_site:/root/repo python \
        artifacts/ab_warp_formulations.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from qpwcnet_tpu.ops.warp import backward_warp, _grid

K_INNER = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _coords(img, flow):
    b, h, w, c = img.shape
    flow = flow.astype(jnp.float32)
    gy, gx = _grid(h, w)
    qx = gx[None] + flow[..., 0]
    qy = gy[None] + flow[..., 1]
    x0 = jnp.clip(jnp.floor(qx), 0.0, w - 2.0)
    y0 = jnp.clip(jnp.floor(qy), 0.0, h - 2.0)
    ax = jnp.clip(qx - x0, 0.0, 1.0)[..., None].astype(img.dtype)
    ay = jnp.clip(qy - y0, 0.0, 1.0)[..., None].astype(img.dtype)
    return x0.astype(jnp.int32), y0.astype(jnp.int32), ax, ay


def warp_b_four_taa(img, flow):
    b, h, w, c = img.shape
    x0, y0, ax, ay = _coords(img, flow)
    flat = img.reshape(b, h * w, c)
    lin = (y0 * w + x0).reshape(b, h * w)

    def gat(off):
        return jnp.take_along_axis(
            flat, (lin + off)[..., None], axis=1).reshape(b, h, w, c)

    g00, g01 = gat(0), gat(1)
    g10, g11 = gat(w), gat(w + 1)
    top = g00 + (g01 - g00) * ax
    bot = g10 + (g11 - g10) * ax
    return top + (bot - top) * ay


def warp_c_take_flat(img, flow):
    b, h, w, c = img.shape
    x0, y0, ax, ay = _coords(img, flow)
    flat = img.reshape(b * h * w, c)
    base = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None]
    lin = base + y0 * w + x0

    def gat(off):
        return jnp.take(flat, lin + off, axis=0, mode="clip")

    g00, g01 = gat(0), gat(1)
    g10, g11 = gat(w), gat(w + 1)
    top = g00 + (g01 - g00) * ax
    bot = g10 + (g11 - g10) * ax
    return top + (bot - top) * ay


def chained(fn):
    @jax.jit
    def run(img, flow):
        def body(_, carry):
            im, fl = carry
            out = fn(im, fl)
            eps = 7.8e-3 * (1.0 + 0.1 * jnp.tanh(
                jnp.mean(out, dtype=jnp.float32)))
            s = 1.0 + eps
            return (im * s.astype(im.dtype), fl * (2.0 - s))

        im, fl = jax.lax.fori_loop(0, K_INNER, body, (img, flow))
        return jnp.sum(im[0, 0, :2].astype(jnp.float32)
                       + fl[0, 0, 0, :2])

    return run


def main():
    shapes = [
        ("1/2-level feats", (8, 224, 512, 16), 16.0),
        ("full-res image", (8, 448, 1024, 3), 32.0),
    ]
    impls = [
        ("A single-gather-2x2xC", backward_warp),
        ("B four-taa-flatHW", warp_b_four_taa),
        ("C take-flatBHW", warp_c_take_flat),
    ]
    rng = np.random.RandomState(0)
    for sname, (b, h, w, c), fmax in shapes:
        img = jnp.asarray(
            rng.randn(b, h, w, c).astype(np.float32), dtype=jnp.bfloat16)
        flow = jnp.asarray(
            rng.uniform(-fmax, fmax, (b, h, w, 2)).astype(np.float32))
        ref = None
        for name, fn in impls:
            out = jax.jit(fn)(img, flow)
            out = np.asarray(out, dtype=np.float32)
            if ref is None:
                ref = out
            else:
                d = np.max(np.abs(out - ref))
                assert d < 5e-2, (sname, name, d)
            r = chained(fn)
            t0 = time.perf_counter()
            float(r(img, flow))
            log(f"{sname} {name}: compile {time.perf_counter()-t0:.0f}s")
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(r(img, flow))
                best = min(best, (time.perf_counter() - t0) / K_INNER)
            log(f"{sname} {name}: {best*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
