"""A/B: batch-in-channels grouped spelling of the low-C encoder stages.

enc_hlo.py attribution (round 5): stage-0/1 convs are assigned layout
{3,0,2,1:T(8,128)} — C=16 in LANES padded 8x to 128 (469.8 MB per
logical-58.7 MB tensor) — while the Mish fusions run in the compact
W-minor layout, with full 470 MB relayout copies in between. ~8 GB of
the encoder's 8.09 GB accessed is this padding + ping-pong.

The candidate fix: reshape (B,H,W,C) -> (1,H,W,B*C) and run each stage
conv as a feature_group_count=B grouped conv whose kernel is the
original kernel tiled per group — numerically EXACT (group g convolves
batch element g's channels with the shared weights), and B*C >= 256
fills the lane dim with zero padding.

Run alone: PYTHONPATH=/root/.axon_site:/root/repo python artifacts/ab_group_stem.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def grouped_encoder(params, x, n_grouped: int, dtype, filters=(16, 32, 64, 128, 256)):
    """Encoder forward with the first n_grouped stages in the
    batch-in-channels grouped spelling. Returns the final feature map
    (parity with enc.apply(...)[-1])."""
    from qpwcnet_tpu.ops.activations import mish

    b = x.shape[0]
    f = x.astype(dtype)
    merged = False
    for i, _ in enumerate(filters):
        sp = params[f"stage_{i}"]
        if i < n_grouped:
            if not merged:
                # (B,H,W,C) -> (1,H,W,B*C), C minor within each group
                f = jnp.transpose(f, (1, 2, 0, 3)).reshape(
                    1, f.shape[1], f.shape[2], -1)
                merged = True
            for name, stride in (("conv_a", 2), ("conv_aa", 1),
                                 ("conv_b", 1)):
                k = sp[name]["kernel"].astype(dtype)
                bias = sp[name]["bias"].astype(dtype)
                kt = jnp.tile(k, (1, 1, 1, b))
                f = jax.lax.conv_general_dilated(
                    f, kt, (stride, stride), "SAME",
                    feature_group_count=b,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                f = mish(f + jnp.tile(bias, b))
        else:
            if merged:
                h, w = f.shape[1], f.shape[2]
                f = f.reshape(h, w, b, -1).transpose(2, 0, 1, 3)
                merged = False
            for name, stride in (("conv_a", 2), ("conv_aa", 1),
                                 ("conv_b", 1)):
                k = sp[name]["kernel"].astype(dtype)
                bias = sp[name]["bias"].astype(dtype)
                f = jax.lax.conv_general_dilated(
                    f, k, (stride, stride), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                f = mish(f + bias)
    if merged:
        h, w = f.shape[1], f.shape[2]
        f = f.reshape(h, w, b, -1).transpose(2, 0, 1, 3)
    return f


def main():
    sys.path.insert(0, "/root/repo")
    from qpwcnet_tpu.models import build_flow_net
    from qpwcnet_tpu.models.pwcnet import Encoder
    from qpwcnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    hw = tuple(int(v) for v in os.environ.get(
        "PROF_HW", "448,1024").split(","))
    batch = int(os.environ.get("PROF_BATCH", "8"))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    variants = [int(v) for v in os.environ.get(
        "GROUP_STAGES", "0,1,2,3").split(",")]

    model, variables = build_flow_net(jax.random.key(0), hw, dtype=dtype)
    eparams = variables["params"]["encoder"]
    rng = np.random.RandomState(0)
    xe = jnp.asarray(rng.uniform(
        -0.5, 0.5, (2 * batch, hw[0], hw[1], 3)).astype(np.float32))

    # reference output for equality checks
    enc = Encoder(dtype=dtype)
    ref = jax.jit(lambda v, x: enc.apply(v, x, train=False)[-1])(
        {"params": eparams}, xe)
    jax.block_until_ready(ref)

    for n in variants:
        @jax.jit
        def chained(p, x, _n=n):
            out = grouped_encoder(p, x, _n, dtype)
            x2 = x * 1.001 + 1e-3 * jnp.mean(
                out.astype(jnp.float32), dtype=jnp.float32)
            return x2, jnp.sum(x2[0, 0, :2])

        x = xe
        t0 = time.perf_counter()
        x, s = chained(eparams, x)
        jax.block_until_ready(x)
        log(f"grouped_stages={n}: compile+first "
            f"{time.perf_counter() - t0:.1f}s")

        best = float("inf")
        for w in range(4):
            n_iter = 2 if w == 0 else 8
            t0 = time.perf_counter()
            for _ in range(n_iter):
                x, s = chained(eparams, x)
            assert np.isfinite(float(s))
            dt = (time.perf_counter() - t0) / n_iter
            best = min(best, dt)
            log(f"  window {w}: {dt * 1e3:.2f} ms")
        log(f"grouped_stages={n}: BEST {best * 1e3:.2f} ms")
        try:
            ca = chained.lower(eparams, xe).compile().cost_analysis()
            log(f"  bytes accessed: "
                f"{float(ca['bytes accessed']) / 1e9:.2f} GB")
        except Exception as e:
            log(f"  cost_analysis failed: {e!r}")

        out = jax.jit(
            lambda p, x, _n=n: grouped_encoder(p, x, _n, dtype)
        )(eparams, xe)
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - ref.astype(jnp.float32))))
        log(f"  max |out - reference encoder|: {err:.3e}")


if __name__ == "__main__":
    main()
