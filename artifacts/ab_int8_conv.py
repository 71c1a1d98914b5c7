"""Micro A/B: is an int8 conv actually faster than bf16 on v5e here?

VERDICT r3 weak-2: int8 inference (QTensor chaining) still measures
slower than bf16 (r4: 95.2 vs 112.5 pairs/s). This isolates the
primitive: one 3x3 conv at a finest-level shape, racing
  * bf16 x bf16 -> bf16
  * int8 x int8 -> int32 (preferred_element_type), plus the dequant+
    requant epilogue the QTensor chain pays per layer
  * int8 x int8 -> int32 bare (no epilogue)

If bare int8 is not faster than bf16, the MXU int8 path is not being
hit (or has no advantage at these bandwidth-bound shapes) and the
qtensor.py claim must be rewritten to match measurement.

Run: PYTHONPATH=/root/.axon_site:/root/repo python artifacts/ab_int8_conv.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

K = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def conv(x, w, out_t):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_t)


def race(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(_, c):
            out = fn(*c)
            s = 1 + 1e-3 * jnp.tanh(jnp.mean(out, dtype=jnp.float32))
            return tuple(
                (x * s).astype(x.dtype) if x.dtype != jnp.int8
                else (x ^ jnp.int8(1)) for x in c)

        c = jax.lax.fori_loop(0, K, body, args)
        return sum(jnp.sum(x[0, 0, 0, :2].astype(jnp.float32))
                   for x in c)

    t0 = time.perf_counter()
    float(run(*args))
    log(f"{name}: compile {time.perf_counter() - t0:.0f}s")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    log(f"{name}: {best * 1e3:7.3f} ms")


def main():
    rng = np.random.RandomState(0)
    b, h, w, cin, cout = 8, 224, 512, 64, 64
    log(f"shape=({b},{h},{w},{cin})->{cout} 3x3, backend="
        f"{jax.default_backend()}")
    xf = jnp.asarray(rng.randn(b, h, w, cin), dtype=jnp.bfloat16)
    wf = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, dtype=jnp.bfloat16)
    xq = jnp.asarray(rng.randint(-127, 128, (b, h, w, cin)), jnp.int8)
    wq = jnp.asarray(rng.randint(-127, 128, (3, 3, cin, cout)), jnp.int8)

    race("bf16 conv", lambda x, w_: conv(x, w_, jnp.bfloat16), xf, wf)
    race("int8 conv bare->int32",
         lambda x, w_: conv(x, w_, jnp.int32), xq, wq)

    def int8_chain(x, w_):
        acc = conv(x, w_, jnp.int32)
        y = acc.astype(jnp.float32) * 1.7e-4 + 0.01   # dequant+bias
        y = jnp.maximum(y, 0.1 * y)                    # activation
        q = jnp.clip(jnp.round(y * 23.0), -127, 127)   # requant
        return q.astype(jnp.int8)

    race("int8 conv + dequant/act/requant epilogue", int8_chain, xq, wq)


if __name__ == "__main__":
    main()
