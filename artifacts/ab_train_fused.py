"""Train-step A/B (VERDICT r4 task 6): can training use the fused
forwards? Supervised flow step at the reference config (256x512, bs=16,
train.py:503) with:

  base        exact pair everywhere (r4 baseline: 152 ms/step)
  fast        cv_impl='fast' — warp_cost_volume_trainable at the finest
              level (fused Pallas forward, backward recomputes through
              the measured-fast unfused VJPs)
  stem2       stem_stages=2 — downconv_stage_trainable (fused Pallas
              stem forward, exact composition VJP)
  fast_stem2  both

The evolving TrainState is the serial chain (params change every step),
so the tunnel result cache can never replay steps.

Run: PYTHONPATH=/root/.axon_site:/root/repo python artifacts/ab_train_fused.py [variants...]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


VARIANTS = {
    "base": dict(),
    "fast": dict(cv_impl="fast"),
    "stem2": dict(stem_stages=2),
    "fast_stem2": dict(cv_impl="fast", stem_stages=2),
}


def main():
    from qpwcnet_tpu.models import build_flow_net
    from qpwcnet_tpu.train.train_state import (
        create_flow_train_state, make_flow_train_step)
    from qpwcnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    hw, bs = (256, 512), 16
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    log(f"backend={jax.default_backend()} hw={hw} bs={bs}")
    model, variables = build_flow_net(jax.random.key(0), hw, dtype=dtype)
    rng = np.random.RandomState(0)
    batch = {
        "ims": jnp.asarray(rng.uniform(
            -0.5, 0.5, (bs, hw[0], hw[1], 6)).astype(np.float32)),
        "flo": jnp.asarray(rng.uniform(
            -8, 8, (bs, hw[0], hw[1], 2)).astype(np.float32)),
    }

    names = [a for a in sys.argv[1:] if a in VARIANTS] or list(VARIANTS)
    results = {}
    for name in names:
        m = model.clone(**VARIANTS[name])
        state = create_flow_train_state(m, variables)
        step = jax.jit(make_flow_train_step())
        t0 = time.perf_counter()
        state, metrics = step(state, batch)
        jax.block_until_ready(state.params)
        loss0 = float(metrics["loss"])
        log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s "
            f"loss={loss0:.4f}")
        assert np.isfinite(loss0), loss0
        best = float("inf")
        for w in range(4):
            t0 = time.perf_counter()
            for _ in range(6):
                state, metrics = step(state, batch)
            float(metrics["loss"])  # host readout = the only real sync
            best = min(best, (time.perf_counter() - t0) / 6)
        results[name] = (best, float(metrics["loss"]))
        log(f"{name}: {best * 1e3:.2f} ms/step -> {bs / best:.1f} img/s "
            f"(loss {results[name][1]:.4f})")

    log("---- summary (r4 baseline: 152 ms/step = 105 img/s) ----")
    for name, (best, loss) in results.items():
        log(f"{name:11s} {best * 1e3:7.2f} ms/step  {bs / best:6.1f} img/s"
            f"  loss {loss:.4f}")


if __name__ == "__main__":
    main()
