"""In-model A/B of warp gather formulations on the headline forward.

The standalone warp A/B proved misleading (in-model XLA schedules the
gather far better), so this times the FULL 448x1024 b8 bf16 forward
with each formulation (ops/warp.py set_warp_gather) and checks output
equality.

Run: PYTHONPATH=/root/.axon_site:/root/repo python artifacts/ab_warp_inmodel.py
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
    model, variables = build_flow_net(jax.random.key(0), hw, dtype=dtype)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.uniform(
        -0.5, 0.5, (batch, hw[0], hw[1], 6)).astype(np.float32))
    log(f"backend={jax.default_backend()} hw={hw} b={batch}")

    ref = None
    for kind in ("gather2x2", "taa4"):
        warp.set_warp_gather(kind)

        def fwd_fn(v, x):
            return model.apply(v, x, train=False)

        out = np.asarray(jax.jit(fwd_fn)(variables, x0), np.float32)
        if ref is None:
            ref = out
        else:
            log(f"{kind}: max|diff| vs gather2x2 = "
                f"{np.max(np.abs(out - ref)):.2e}")

        @jax.jit
        def chained(v, x):
            def body(_, xx):
                o = fwd_fn(v, xx)
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
