"""A/B: fused warp+correlate Pallas kernel vs the unfused
backward_warp -> cost_volume_pallas pair, at the two finest pyramid
levels of the 448x1024 headline config (VERDICT r3 task 3 — the
measured attempt that decides whether the north-star fusion ships).

Measurement protocol: each timing window is ONE device dispatch — a
jitted lax.fori_loop chaining k iterations with a feedback perturbation
(multiplicative, bf16-surviving) so neither async pipelining nor the
tunnel result cache can fake the numbers, and the per-dispatch tunnel
round trip (5-1400 ms observed, varies with tunnel load) is amortized
to nothing. A first version of this script timed per-iteration
dispatches and produced garbage (the same unfused pair "measured"
1418 ms, 269 ms and 77 ms in one session).

Run on the axon TPU:
    PYTHONPATH=/root/.axon_site:/root/repo \
        python artifacts/ab_fused_warp_cv.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


K_INNER = 20  # chained iterations inside one dispatch


def chained_loop(fn):
    """jit( (prv, nxt, flow) -> scalar ) running K_INNER chained calls."""

    @jax.jit
    def run(prv, nxt, flow):
        def body(_, carry):
            p, n, f = carry
            out = fn(p, n, f)
            # scalar feedback large enough to survive bf16 rounding.
            # EVERY carry is perturbed: any operand left loop-invariant
            # lets XLA hoist the work that consumes it out of the loop
            # (observed: a warp-only body timed as a no-op because both
            # its inputs were invariant).
            eps = 7.8e-3 * (1.0 + 0.1 * jnp.tanh(
                jnp.mean(out, dtype=jnp.float32)))
            s = (1.0 + eps)
            return (p * s.astype(p.dtype), n * s.astype(n.dtype),
                    f * (2.0 - s))

        p, n, f = jax.lax.fori_loop(0, K_INNER, body, (prv, nxt, flow))
        return jnp.sum(p[0, 0, 0, :2].astype(jnp.float32)
                       + n[0, 0, 0, :2].astype(jnp.float32)
                       + f[0, 0, 0, :2])

    return run


def time_windows(run, args, n_windows=4):
    s = run(*args)           # compile + warmup
    jax.block_until_ready(s)
    best = float("inf")
    for _ in range(n_windows):
        t0 = time.perf_counter()
        float(run(*args))    # host readout syncs
        best = min(best, (time.perf_counter() - t0) / K_INNER)
    return best * 1e3


def main():
    from qpwcnet_tpu.ops.pallas.cost_volume_kernel import cost_volume_pallas
    from qpwcnet_tpu.ops.pallas.warp_cv_kernel import warp_cost_volume_pallas
    from qpwcnet_tpu.ops.warp import backward_warp
    from qpwcnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    log(f"backend={jax.default_backend()} dtype={dtype.__name__} "
        f"k={K_INNER}")

    # (level, B, H, W, C) — the two finest UpFlow levels at 448x1024 b8.
    configs = [
        ("1/2 (finest)", 8, 224, 512, 16),
        ("1/4", 8, 112, 256, 32),
    ]
    ww = 4
    for name, b, h, w, c in configs:
        rng = np.random.RandomState(0)
        prv = jnp.asarray(
            rng.randn(b, h, w, c).astype(np.float32)).astype(dtype)
        nxt = jnp.asarray(
            rng.randn(b, h, w, c).astype(np.float32)).astype(dtype)
        flow = jnp.asarray(
            (rng.rand(b, h, w, 2).astype(np.float32) * 2 - 1)
            * (ww - 0.5))

        def warp_only(p, n, f):
            return backward_warp(n, f)

        def cv_only(p, n, f):
            return cost_volume_pallas(p, n, 4)

        def unfused(p, n, f):
            return cost_volume_pallas(p, backward_warp(n, f), 4)

        def fused(p, n, f):
            return warp_cost_volume_pallas(p, n, f, 4, warp_window=ww)

        # correctness probe on-device first
        a = jax.jit(unfused)(prv, nxt, flow)
        bb = jax.jit(fused)(prv, nxt, flow)
        err = float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - bb.astype(jnp.float32))))
        log(f"[ww={ww}] {name}: max|diff|={err:.3e}")

        for label, fn in (("warp-only", warp_only), ("cv-only", cv_only),
                          ("unfused", unfused), ("fused", fused)):
            t0 = time.time()
            ms = time_windows(chained_loop(fn), (prv, nxt, flow))
            log(f"[ww={ww}] {name}: {label:9s} {ms:7.2f} ms "
                f"(wall {time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
