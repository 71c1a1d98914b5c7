"""A/B of the fused Pallas encoder-stem kernel on the 448x1024 b8
headline (VERDICT r4 task 1: kill the encoder's measured 10x
relayout-copy HBM waste): exact vs stem_stages=1/2/3, plus the
combined best-inference config (stem + cv_impl='fast' per-level
dispatch).

Also probes compiled-kernel correctness on real TPU first: encoder
features of the Mosaic-compiled stem vs the exact conv path (bf16
tolerance) — interpret-mode tests don't exercise Mosaic compilation.

Run: PYTHONPATH=/root/.axon_site:/root/repo python artifacts/ab_stem.py [variants...]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


VARIANTS = {
    "stem1": dict(stem_stages=1),
    "stem2": dict(stem_stages=2),
    "stem3": dict(stem_stages=3),
    "stem2_fast": dict(stem_stages=2, cv_impl="fast"),
    # round-5 tail: fused Pallas transpose-conv for the decoder's
    # trailing low-C stages (ops/pallas/upconv_kernel.py).
    "stem2_up1": dict(stem_stages=2, upconv_stages=1),
    "stem2_up2": dict(stem_stages=2, upconv_stages=2),
    "stem2_up2_fast": dict(stem_stages=2, upconv_stages=2,
                           cv_impl="fast"),
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

    # ---- correctness probe: compiled stem vs exact encoder feats ----
    if "nocheck" not in sys.argv[1:]:
        x3 = jnp.asarray(rng.uniform(
            -0.5, 0.5, (2, 448, 1024, 3)).astype(np.float32))

        def enc(m, img):
            return m.encoder(img, train=False)

        t0 = time.perf_counter()
        f_ref = jax.jit(lambda v, x: model.apply(v, x, method=enc))(
            variables, x3)
        f_got = jax.jit(
            lambda v, x: model.clone(stem_stages=2).apply(
                v, x, method=enc))(variables, x3)
        errs = [
            float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
            for a, b in zip(f_ref, f_got)
        ]
        mags = [float(jnp.max(jnp.abs(a.astype(jnp.float32))))
                for a in f_ref]
        log(f"compiled stem equality ({time.perf_counter() - t0:.0f}s): "
            f"maxerr per level {['%.3e' % e for e in errs]} "
            f"(feat maxabs {['%.2f' % m for m in mags]})")

    names = [a for a in sys.argv[1:] if a in VARIANTS] or list(VARIANTS)
    results = {}
    for name in names:
        m = model.clone(**VARIANTS[name])

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

    log("---- summary (exact baseline this session: 70.78 ms) ----")
    for name, best in results.items():
        log(f"{name:12s} {best * 1e3:7.2f} ms  {batch / best:7.2f} pairs/s")


if __name__ == "__main__":
    main()
