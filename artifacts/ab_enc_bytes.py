"""Encoder-only bytes-accessed + time A/B: exact conv path vs the fused
Pallas stem kernel (VERDICT r4 task 1 'Done' criterion: encoder bytes
8.7 GB -> <= 2 GB, measured).

Run: PYTHONPATH=/root/.axon_site:/root/repo python artifacts/ab_enc_bytes.py
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
    from qpwcnet_tpu.utils.profiling import cost_analysis

    enable_compile_cache()
    hw, batch = (448, 1024), 8
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model, variables = build_flow_net(jax.random.key(0), hw, dtype=dtype)
    # The production forward runs the (2B-stacked) siamese encoder once;
    # measure exactly that shape. Generated ON DEVICE: a first attempt
    # fed a 117 MB host f32 array and the tunnel transfer hung
    # indefinitely (the bench's largest working host transfer is 88 MB).
    x3 = jax.jit(
        lambda k: jax.random.uniform(
            k, (2 * batch, hw[0], hw[1], 3), jnp.float32, -0.5, 0.5)
    )(jax.random.key(1))
    jax.block_until_ready(x3)
    log("device input ready")

    def enc(m, img):
        return m.encoder(img, train=False)

    for name, stem in (("exact", 0), ("stem1", 1), ("stem2", 2)):
        m = model.clone(stem_stages=stem)

        @jax.jit
        def chained(variables, x, _m=m):
            feats = _m.apply(variables, x, method=enc)
            f = feats[-1]
            x2 = x * 1.001 + 1e-3 * jnp.mean(
                f.astype(jnp.float32), dtype=jnp.float32)
            return x2, jnp.sum(x2[0, 0, :2])

        x = x3
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
        gb = float("nan")
        try:
            ca = cost_analysis(chained, variables, x)
            gb = float(ca.get("bytes accessed", 0)) / 1e9
        except Exception as e:
            log(f"  cost_analysis failed: {e!r}")
        log(f"{name}: {best * 1e3:7.2f} ms  bytes {gb:6.2f} GB  "
            f"-> {gb / best:5.0f} GB/s")


if __name__ == "__main__":
    main()
