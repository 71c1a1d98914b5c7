"""Per-stage timing of the interp pretrain step (VERDICT r3 task 5).

The bench measures pretrain_interp at ~40 img/s (bs=8, 256x512) vs
train_flow at ~105 img/s (bs=16) — 2.6x the per-image cost. This script
breaks the interp step into measured stages so the optimization targets
the real cost, not a guess:

  fwd stages (truncated apply):  enc+dec (2B fused) | +flower (2B) |
                                 +pyramid+interp heads (full fwd)
  train steps:                   full interp step | interp step with
                                 final-scale-only loss

Run (axon env):
    PYTHONPATH=/root/.axon_site:/root/repo python artifacts/profile_interp.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from qpwcnet_tpu.models import build_interpolator
    from qpwcnet_tpu.ops.resize import avg_pool_2x, upsample2x_bilinear
    from qpwcnet_tpu.train.train_state import (
        create_flow_train_state, make_interp_train_step)
    from qpwcnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    hw = (256, 512)
    bs = 8
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model, variables = build_interpolator(jax.random.key(0), hw, dtype=dtype)
    log(f"backend={jax.default_backend()} hw={hw} b={bs} {dtype.__name__}")

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.uniform(
        -0.5, 0.5, (bs, hw[0], hw[1], 6)).astype(np.float32))

    def truncated(stage: str):
        def fn(variables, x):
            def run(mod, xx):
                img_prv, img_nxt = jnp.split(xx, 2, axis=-1)
                b = img_prv.shape[0]
                both = jnp.concatenate([img_prv, img_nxt], axis=0)
                encs = mod.encoder(both, train=False)
                decs = mod.decoder(encs, train=False)
                if stage == "encdec":
                    return decs[-1]

                def swap(t):
                    return jnp.concatenate([t[b:], t[:b]], axis=0)

                flos = mod.flower(swap(encs[-1]), encs[-1],
                                  [swap(d) for d in decs], decs,
                                  train=False)
                if stage == "flower":
                    return flos[-1]
                flos_01 = [f[:b] for f in flos]
                flos_10 = [f[b:] for f in flos]
                decs_prv = [d[:b] for d in decs]
                decs_nxt = [d[b:] for d in decs]
                n = len(mod.interps)
                imgs_prv = [img_prv]
                imgs_nxt = [img_nxt]
                for _ in range(n + 1):
                    imgs_prv.append(avg_pool_2x(imgs_prv[-1]))
                    imgs_nxt.append(avg_pool_2x(imgs_nxt[-1]))
                img = mod.interp_0(imgs_prv[-1], imgs_nxt[-1], flos_01[0],
                                   flos_10[0], train=False)
                for i in range(n):
                    img_u = upsample2x_bilinear(img, scale=1.0)
                    img = mod.interps[i](decs_prv[i], decs_nxt[i],
                                         flos_01[i + 1], flos_10[i + 1],
                                         img_u, train=False)
                return upsample2x_bilinear(img, scale=1.0)
            return nn.apply(run, model)(variables, x)
        return fn

    prev = 0.0
    for name in ("encdec", "flower", "full"):
        fn = truncated(name)

        @jax.jit
        def chained(variables, x, _fn=fn):
            out = _fn(variables, x)
            x2 = x * 1.001 + 1e-3 * jnp.mean(out, dtype=jnp.float32)
            return x2, jnp.sum(x2[0, 0, :2])

        t0 = time.perf_counter()
        x, s = chained(variables, x0)
        jax.block_until_ready(x)
        log(f"fwd {name}: compile+first {time.perf_counter() - t0:.1f}s")
        best = float("inf")
        for w in range(3):
            iters = 2 if w == 0 else 6
            t0 = time.perf_counter()
            for _ in range(iters):
                x, s = chained(variables, x)
            float(s)
            best = min(best, (time.perf_counter() - t0) / iters)
        log(f"fwd {name}: {best * 1e3:7.2f} ms (+{best * 1e3 - prev:6.2f})")
        prev = best * 1e3

    # full train step (the bench's measurement) + final-only-loss variant
    for label, step_fn in (
        ("train full-loss", make_interp_train_step()),
        ("train final-only", _final_only_step()),
    ):
        state = create_flow_train_state(model, variables)
        step = jax.jit(step_fn)
        batch = {
            "ims": x0,
            "mid": jnp.asarray(rng.uniform(
                -0.5, 0.5, (bs, hw[0], hw[1], 3)).astype(np.float32)),
        }
        t0 = time.perf_counter()
        state, m = step(state, batch)
        jax.block_until_ready(state.params)
        log(f"{label}: compile+first {time.perf_counter() - t0:.1f}s")
        best = float("inf")
        for w in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                state, m = step(state, batch)
            float(m["loss"])
            best = min(best, (time.perf_counter() - t0) / 4)
        log(f"{label}: {best * 1e3:7.2f} ms/step -> {bs / best:.1f} img/s")


def _final_only_step():
    import optax  # noqa: F401
    from qpwcnet_tpu.train.train_state import (
        _merge_mutated, _model_variables, _mutable_for)

    def train_step(state, batch):
        def loss_fn(params):
            outs, mut = state.apply_fn(
                _model_variables(state, params), batch["ims"],
                train=True, mutable=_mutable_for(state))
            loss = jnp.mean(jnp.square(outs[-1] - batch["mid"]))
            return loss, mut

        (loss, mut), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = _merge_mutated(state, mut)
        return state, {"loss": loss}

    return train_step


if __name__ == "__main__":
    main()
