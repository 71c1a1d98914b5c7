"""Benchmark harness: flow image-pairs/sec/chip at 448x1024 (BASELINE.json
headline metric), batch=8 full multiscale PWC-Net inference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the only throughput number the reference
publishes: ~6.6 images/s on its (unspecified) training GPU
(README.md:56-70; BASELINE.md). Extra diagnostic lines go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PAIRS_PER_SEC = 6.6  # reference README pretrain log (~1.2s/step, bs=8)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from qpwcnet_tpu.models import build_flow_net
    from qpwcnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    hw = (448, 1024)
    batch = 8
    # bf16 compute: 94ms vs 106ms f32 at this shape (HBM-bandwidth-bound
    # model; params/BN/flow-heads stay f32 inside the blocks)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    log(f"backend={jax.default_backend()} shape={hw} batch={batch} "
        f"compute_dtype={dtype.__name__}")

    model, variables = build_flow_net(jax.random.key(0), hw, dtype=dtype)

    @jax.jit
    def forward(variables, ims):
        return model.apply(variables, ims, train=False)

    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.uniform(-0.5, 0.5,
                    (batch, hw[0], hw[1], 6)).astype(np.float32)
    )

    # compile + warmup
    t0 = time.perf_counter()
    out = forward(variables, x)
    out.block_until_ready()
    log(f"compile+first-run: {time.perf_counter() - t0:.1f}s")
    assert np.isfinite(np.asarray(out[:1, :8, :8])).all()

    # Timed with a serial output->input dependency chain: each step's
    # input derives from the previous step's flow. This defeats both
    # async-dispatch pipelining AND the remote tunnel's result caching
    # of repeated identical executions (which otherwise fakes a ~400x
    # speedup). Slightly conservative: includes the feedback concat+add.
    # Best-of-5 windows: the shared tunnel shows >2x run-to-run
    # variance; the fastest window is closest to true device speed.
    best_dt = float("inf")
    for w in range(5):
        n_iter = 8
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = forward(variables, x)
            x = x + 1e-3 * jnp.concatenate([out, out, out], axis=-1)
        x.block_until_ready()
        dt = (time.perf_counter() - t0) / n_iter
        log(f"window {w}: chained step={dt * 1e3:.2f} ms")
        best_dt = min(best_dt, dt)
    pairs_per_sec = batch / best_dt
    log(f"best: {best_dt * 1e3:.2f} ms -> {pairs_per_sec:.1f} pairs/s")

    print(json.dumps({
        "metric": "flow image-pairs/sec/chip at 448x1024 (batch=8, "
                  "multiscale inference)",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
