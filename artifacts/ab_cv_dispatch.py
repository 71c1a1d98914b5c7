"""In-model A/B of per-level cv_impl dispatch on the 448x1024 headline
(VERDICT r4 tasks 3+8): where does the fused warp+correlate kernel's
15.8 ms standalone win at the finest level go inside the model, and is
a mixed per-level dispatch (fused only at the fine levels) better than
all-fused?

Variants (Flower cv_impl; tuple order = flow_0, upflow_0..3 coarse->fine):
  exact       'auto'  (pallas cost volume + gather warp everywhere)
  fused_all   'fused'
  fused_f1    ('pallas','pallas','pallas','pallas','fused')   finest only
  fused_f2    ('pallas','pallas','pallas','fused','fused')    two finest

Timing: the bench.py chained-feedback protocol (serial output->input
dependency, host scalar readout as the sync) — see bench.py headline
stage for why.

Run: PYTHONPATH=/root/.axon_site:/root/repo python artifacts/ab_cv_dispatch.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


VARIANTS = {
    "exact": "auto",
    "fused_all": "fused",
    "fused_f1": ("pallas", "pallas", "pallas", "pallas", "fused"),
    "fused_f2": ("pallas", "pallas", "pallas", "fused", "fused"),
}


def main():
    from qpwcnet_tpu.models import build_flow_net
    from qpwcnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    hw, batch = (448, 1024), 8
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    log(f"backend={jax.default_backend()} hw={hw} b={batch}")
    t0 = time.perf_counter()
    model, variables = build_flow_net(jax.random.key(0), hw, dtype=dtype)
    log(f"build: {time.perf_counter() - t0:.0f}s")
    rng = np.random.RandomState(0)

    names = sys.argv[1:] or list(VARIANTS)
    results = {}
    for name in names:
        impl = VARIANTS[name]
        m = model.clone(cv_impl=impl)

        @jax.jit
        def chained(variables, x, _m=m):
            out = _m.apply(variables, x, train=False)
            x2 = x * 1.001 + 1e-3 * jnp.concatenate([out, out, out],
                                                    axis=-1)
            return x2, jnp.sum(x2[0, 0, :2])

        x = jnp.asarray(rng.uniform(
            -0.5, 0.5, (batch, hw[0], hw[1], 6)).astype(np.float32))
        t0 = time.perf_counter()
        x, s = chained(variables, x)
        jax.block_until_ready(x)
        log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")
        best = float("inf")
        for w in range(4):
            n_iter = 2 if w == 0 else 8
            t0 = time.perf_counter()
            for _ in range(n_iter):
                x, s = chained(variables, x)
            assert np.isfinite(float(s))
            best = min(best, (time.perf_counter() - t0) / n_iter)
        results[name] = best
        log(f"{name}: {best * 1e3:.2f} ms -> {batch / best:.2f} pairs/s")

    log("---- summary ----")
    for name, best in results.items():
        log(f"{name:10s} {best * 1e3:7.2f} ms  {batch / best:7.2f} pairs/s")


if __name__ == "__main__":
    main()
