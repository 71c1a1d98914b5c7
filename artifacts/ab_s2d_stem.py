"""A/B: space-to-depth stem spelling vs plain convs (round 5, VERDICT #1).

Round-4 attribution (hlo_bytes.py): the encoder accesses 8.7 GB at the
448x1024 b8 headline — ~10x its logical tensors — because XLA:TPU picks
spatial-minor layouts for the low-C stem convs and pays relayout copies.
This measures the headline forward with the first N encoder stages'
stride-2 convs in the exact s2d spelling (qlayers._s2d_conv), plus the
encoder-only bytes-accessed per variant.

Run ALONE (one TPU process at a time — concurrent axon-tunnel clients
stall each other):
  PYTHONPATH=/root/.axon_site:/root/repo python artifacts/ab_s2d_stem.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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
    stages_list = [int(v) for v in os.environ.get(
        "S2D_STAGES", "0,1,2,5").split(",")]

    model, variables = build_flow_net(jax.random.key(0), hw, dtype=dtype)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.uniform(
        -0.5, 0.5, (batch, hw[0], hw[1], 6)).astype(np.float32))

    ref_out = None
    for n in stages_list:
        m = model.clone(s2d_stages=n)

        @jax.jit
        def chained(variables, x, m=m):
            out = m.apply(variables, x, train=False)
            x2 = x * 1.001 + 1e-3 * jnp.concatenate([out, out, out],
                                                    axis=-1)
            return x2, jnp.sum(x2[0, 0, :2])

        x = x0
        t0 = time.perf_counter()
        x, s = chained(variables, x)
        jax.block_until_ready(x)
        log(f"s2d_stages={n}: compile+first {time.perf_counter()-t0:.1f}s")

        best = float("inf")
        for w in range(4):
            n_iter = 2 if w == 0 else 8
            t0 = time.perf_counter()
            for _ in range(n_iter):
                x, s = chained(variables, x)
            readout = float(s)
            assert np.isfinite(readout)
            dt = (time.perf_counter() - t0) / n_iter
            best = min(best, dt)
            log(f"  window {w}: {dt*1e3:.2f} ms")
        log(f"s2d_stages={n}: BEST {best*1e3:.2f} ms -> "
            f"{batch/best:.1f} pairs/s")

        # full-model bytes accessed (XLA estimate)
        try:
            ca = chained.lower(variables, x0).compile().cost_analysis()
            log(f"  model bytes accessed: "
                f"{float(ca['bytes accessed'])/1e9:.2f} GB")
        except Exception as e:
            log(f"  cost_analysis failed: {e!r}")

        # encoder-only bytes (2B-stacked input, = the fused-batch call)
        try:
            enc = Encoder(dtype=dtype, s2d_stages=n)
            ev = {"params": variables["params"]["encoder"]}
            xe = jnp.concatenate([x0[..., :3], x0[..., 3:]], axis=0)
            efn = jax.jit(lambda v, x: enc.apply(v, x, train=False)[-1])
            ca = efn.lower(ev, xe).compile().cost_analysis()
            log(f"  encoder-only bytes accessed: "
                f"{float(ca['bytes accessed'])/1e9:.2f} GB")
        except Exception as e:
            log(f"  encoder cost_analysis failed: {e!r}")

        # value check vs reference variant
        out = m.apply(variables, x0, train=False)
        if ref_out is None:
            ref_out = out
        else:
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref_out.astype(jnp.float32))))
            log(f"  max |flow - s2d0 flow|: {err:.3e}")


if __name__ == "__main__":
    main()
