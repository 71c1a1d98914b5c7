"""Per-stage timing + bytes breakdown of the headline forward on TPU.

Builds truncated variants of the flagship PWCFlowNet forward (encoders
only; +decoders; +flow_0; +upflow_0..3) and times each with the chained
host-readout protocol, reporting per-stage deltas and XLA
bytes-accessed, so the round-4 perf work (VERDICT tasks 3/7) targets
measured stages instead of estimates.

Run (foreground, axon env):
    PYTHONPATH=/root/.axon_site:/root/repo python artifacts/profile_stages.py
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
    from qpwcnet_tpu.models.pwcnet import PWCFlowNet
    from qpwcnet_tpu.utils.compile_cache import enable_compile_cache
    from qpwcnet_tpu.utils.profiling import cost_analysis

    import os
    enable_compile_cache()
    hw = tuple(int(v) for v in os.environ.get(
        "PROF_HW", "448,1024").split(","))
    batch = int(os.environ.get("PROF_BATCH", "8"))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    quant = None
    if os.environ.get("PROF_INT8"):  # per-stage int8-vs-bf16 comparison
        from qpwcnet_tpu.quantize import QuantConfig
        quant = QuantConfig(mode="int8")
    # PROF_CV_IMPL: '' (auto) | 'fused' | comma-tuple per level, e.g.
    # 'pallas,pallas,pallas,fused,fused' — profiles the fused fast path
    # stage by stage (VERDICT r4 #3: find where the standalone win goes).
    cv_impl = os.environ.get("PROF_CV_IMPL", "auto")
    if "," in cv_impl:
        cv_impl = tuple(cv_impl.split(","))
    # PROF_S2D: int, number of encoder stages in the s2d spelling.
    s2d_stages = int(os.environ.get("PROF_S2D", "0"))
    model, variables = build_flow_net(jax.random.key(0), hw, dtype=dtype,
                                      quant=quant, cv_impl=cv_impl,
                                      s2d_stages=s2d_stages)
    log(f"backend={jax.default_backend()} hw={hw} b={batch} {dtype.__name__}"
        f" int8={bool(quant)} cv_impl={cv_impl} s2d={s2d_stages}")

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.uniform(
        -0.5, 0.5, (batch, hw[0], hw[1], 6)).astype(np.float32))

    def truncated(n_upflows: int | None, stage: str):
        """Forward cut after `stage`; n_upflows limits Flower levels."""
        m: PWCFlowNet = model

        def fn(variables, x):
            def run(mod, xx):
                img_prv, img_nxt = jnp.split(xx, 2, axis=-1)
                b = img_prv.shape[0]
                both = jnp.concatenate([img_prv, img_nxt], axis=0)
                encs = mod.encoder(both, train=False)
                if stage == "enc":
                    return encs[-1]
                decs = mod.decoder(encs, train=False)
                if stage == "dec":
                    return decs[-1]
                encs_prv = [e[:b] for e in encs]
                encs_nxt = [e[b:] for e in encs]
                decs_prv = [d[:b] for d in decs]
                decs_nxt = [d[b:] for d in decs]
                fl = mod.flower
                flo = fl.flow(encs_prv[-1], encs_nxt[-1], train=False)
                if stage == "flow0":
                    return flo
                from qpwcnet_tpu.ops.resize import upsample2x_bilinear
                for i in range(n_upflows):
                    flo_u = upsample2x_bilinear(flo, scale=2.0)
                    flo = fl.upflows[i](decs_prv[i], decs_nxt[i], flo_u,
                                        train=False)
                return flo
            return nn_apply(m, variables, run, x)

        return fn

    import flax.linen as nn

    def nn_apply(mod, variables, body, x):
        return nn.apply(body, mod)(variables, x)

    stages = [
        ("enc", None),
        ("dec", None),
        ("flow0", None),
        ("upflow0", 1),
        ("upflow1", 2),
        ("upflow2", 3),
        ("upflow3", 4),
    ]

    prev_ms = 0.0
    prev_gb = 0.0
    for name, nup in stages:
        fn = truncated(nup, name if nup is None else "up")

        @jax.jit
        def chained(variables, x, _fn=fn):
            out = _fn(variables, x)
            flat = out.reshape(out.shape[0], -1)
            # feedback keeps the chain evolving; readout inside the jit
            x2 = x * 1.001 + 1e-3 * jnp.mean(flat, dtype=jnp.float32)
            return x2, jnp.sum(x2[0, 0, :2])

        t0 = time.perf_counter()
        x, s = chained(variables, x0)
        jax.block_until_ready(x)
        log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")

        best = float("inf")
        for w in range(3):
            iters = 2 if w == 0 else 6
            t0 = time.perf_counter()
            for _ in range(iters):
                x, s = chained(variables, x)
            float(s)
            best = min(best, (time.perf_counter() - t0) / iters)
        gb = 0.0
        try:
            ca = cost_analysis(chained, variables, x)
            gb = float(ca.get("bytes accessed", 0)) / 1e9
        except Exception as e:
            log(f"  cost_analysis failed: {e!r}")
        log(f"{name}: {best * 1e3:7.2f} ms (+{(best * 1e3) - prev_ms:6.2f}) "
            f"bytes {gb:6.2f} GB (+{gb - prev_gb:5.2f}) "
            f"-> {gb / best:5.0f} GB/s")
        prev_ms = best * 1e3
        prev_gb = gb


if __name__ == "__main__":
    main()
