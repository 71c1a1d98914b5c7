"""A/B: fused warp+correlate Pallas kernel vs the unfused
backward_warp -> cost_volume_pallas pair, at the two finest pyramid
levels of the 448x1024 headline config (VERDICT r3 task 3 — the
measured attempt that decides whether the north-star fusion ships).

Run FOREGROUND on the axon TPU:
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


def main():
    from qpwcnet_tpu.ops.pallas.cost_volume_kernel import cost_volume_pallas
    from qpwcnet_tpu.ops.pallas.warp_cv_kernel import warp_cost_volume_pallas
    from qpwcnet_tpu.ops.warp import backward_warp
    from qpwcnet_tpu.utils.compile_cache import enable_compile_cache
    from qpwcnet_tpu.utils.profiling import time_fn_chained

    enable_compile_cache()
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    log(f"backend={jax.default_backend()} dtype={dtype.__name__}")

    # (level, B, H, W, C) — the two finest UpFlow levels at 448x1024 b8.
    configs = [
        ("1/2 (finest)", 8, 224, 512, 16),
        ("1/4", 8, 112, 256, 32),
    ]
    for ww in (4, 8):
        for name, b, h, w, c in configs:
            rng = np.random.RandomState(0)
            prv = jnp.asarray(
                rng.randn(b, h, w, c).astype(np.float32)).astype(dtype)
            nxt = jnp.asarray(
                rng.randn(b, h, w, c).astype(np.float32)).astype(dtype)
            flow = jnp.asarray(
                (rng.rand(b, h, w, 2).astype(np.float32) * 2 - 1)
                * (ww - 0.5))

            def unfused(args):
                p, n, f = args
                return cost_volume_pallas(p, backward_warp(n, f), 4)

            def fused(args, _ww=ww):
                p, n, f = args
                return warp_cost_volume_pallas(p, n, f, 4, warp_window=_ww)

            x0 = (prv, nxt, flow)
            # correctness probe on-device first
            t0 = time.time()
            a = unfused(x0)
            bb = fused(x0)
            err = float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - bb.astype(jnp.float32))))
            log(f"[ww={ww}] {name}: compile+check {time.time()-t0:.1f}s "
                f"max|diff|={err:.3e}")

            tu = time_fn_chained(unfused, x0, iters=10) * 1e3
            tf = time_fn_chained(fused, x0, iters=10) * 1e3
            log(f"[ww={ww}] {name}: unfused {tu:.2f} ms | fused {tf:.2f} ms "
                f"| ratio {tf/tu:.2f}x")


if __name__ == "__main__":
    main()
