"""In-model A/B of warp gather formulations — timing only.

Leaner than ab_warp_inmodel.py: value equality of 'taa4' vs 'gather2x2'
is covered by the CPU unit test (tests/test_warp.py::test_warp_gather
_formulations_equal); here each formulation only compiles + times the
chained headline forward (two full-model compiles instead of four —
the remote-tunnel compile is minutes per program).

Run: PYTHONPATH=/root/.axon_site:/root/repo python artifacts/ab_warp_inmodel2.py [kinds...]
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
    from qpwcnet_tpu.ops import warp
    from qpwcnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    hw, batch = (448, 1024), 8
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    log(f"backend={jax.default_backend()} hw={hw} b={batch}")
    t0 = time.perf_counter()
    model, variables = build_flow_net(jax.random.key(0), hw, dtype=dtype)
    log(f"build: {time.perf_counter() - t0:.0f}s")
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.uniform(
        -0.5, 0.5, (batch, hw[0], hw[1], 6)).astype(np.float32))

    kinds = sys.argv[1:] or ["taa4", "gather2x2"]
    for kind in kinds:
        warp.set_warp_gather(kind)

        @jax.jit
        def chained(v, x):
            def body(_, xx):
                o = model.apply(v, xx, train=False)
                s = 1 + 1e-3 * jnp.tanh(jnp.mean(o, dtype=jnp.float32))
                return xx * s.astype(xx.dtype)

            x = jax.lax.fori_loop(0, 10, body, x)
            return jnp.sum(x[0, 0, 0, :2].astype(jnp.float32))

        t0 = time.perf_counter()
        float(chained(variables, x0))
        log(f"{kind}: compile+first {time.perf_counter() - t0:.0f}s")
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(chained(variables, x0))
            best = min(best, (time.perf_counter() - t0) / 10)
        log(f"{kind}: {best * 1e3:7.2f} ms -> {batch / best:.1f} pairs/s")

    warp.set_warp_gather("gather2x2")


if __name__ == "__main__":
    main()
