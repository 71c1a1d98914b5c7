"""Batch-1 serving latency at 448x1024 (round 5): the bench headline is
throughput at b8; a serving deployment cares about single-pair latency.
Measures the exact (stem) and 'fast' configs at batch=1.

Run: PYTHONPATH=/root/.axon_site:/root/repo python artifacts/ab_latency.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from qpwcnet_tpu.models import build_flow_net
    from qpwcnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    hw, batch = (448, 1024), 1
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model, variables = build_flow_net(
        jax.random.key(0), hw, dtype=dtype,
        stem_stages=2 if jax.default_backend() == "tpu" else 0)
    rng = np.random.RandomState(0)

    for name, m in (("exact_b1", model),
                    ("fast_b1", model.clone(cv_impl="fast"))):
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
            n_iter = 2 if w == 0 else 10
            t0 = time.perf_counter()
            for _ in range(n_iter):
                x, s = chained(variables, x)
            assert np.isfinite(float(s))
            best = min(best, (time.perf_counter() - t0) / n_iter)
        log(f"{name}: {best * 1e3:.2f} ms/pair")


if __name__ == "__main__":
    main()
