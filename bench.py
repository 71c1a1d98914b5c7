"""Benchmark harness: flow image-pairs/sec/chip at 448x1024 (BASELINE.json
headline metric), batch=8 full multiscale PWC-Net inference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the only throughput number the reference
publishes: ~6.6 images/s on its (unspecified) training GPU
(README.md:56-70; BASELINE.md). Extra diagnostic lines go to stderr.

Resilience design (round-3 postmortem: BENCH_r03.json rc=124 parsed=null
because the harness printed JSON only after every stage succeeded, and a
degraded remote-TPU tunnel stalled a late stage):

  * The HEADLINE stage (compile + timing windows of the flagship forward)
    runs FIRST; its result lands in a global RESULT dict immediately.
  * Every other stage (kernel-equality gate, HBM/MFU analysis, train-step
    benches, int8 bench) is an EXTRA: wrapped in try/except, gated on the
    remaining wall-clock budget, and skipped with a logged reason when
    the budget is too tight.
  * The one JSON line is emitted exactly once -- at normal completion, OR
    from a SIGTERM/SIGINT handler (the `timeout` command sends SIGTERM),
    OR from a daemon watchdog thread that fires at BENCH_BUDGET_S (env,
    default 1500 s) even if the main thread is wedged inside a hung
    tunnel RPC. Whatever has completed by then is in the line, tagged
    "partial": true.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 6.6  # reference README pretrain log (~1.2s/step, bs=8)

# v5e peaks for utilization estimates (public spec: 197 bf16 TFLOP/s,
# 394 int8 TOP/s, 819 GB/s HBM).
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_GBPS = 819.0

_T_START = time.perf_counter()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))

RESULT = {
    "metric": "flow image-pairs/sec/chip at 448x1024 (batch=8, "
              "multiscale inference)",
    "value": None,
    "unit": "pairs/s",
    "vs_baseline": None,
}
_STAGES_DONE: list = []
_EMIT_LOCK = threading.Lock()
_EMITTED = False


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining() -> float:
    return _BUDGET_S - (time.perf_counter() - _T_START)


def emit(partial: bool) -> None:
    """Print the one JSON result line exactly once (thread/signal safe)."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
    out = dict(RESULT)
    if partial:
        out["partial"] = True
        out["stages_completed"] = list(_STAGES_DONE)
    try:
        from qpwcnet_tpu.utils.compile_cache import cache_stats
        stats = cache_stats()
        if stats:
            log(f"compile cache: {stats}")
    except Exception:
        pass
    print(json.dumps(out), flush=True)


def _die(reason: str) -> None:
    log(f"bench: emergency emit ({reason}) at t+{time.perf_counter() - _T_START:.0f}s")
    emit(partial=True)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


def _install_guards() -> None:
    def handler(signum, frame):
        _die(f"signal {signum}")

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, handler)
        except (ValueError, OSError):
            pass

    def watchdog():
        # Daemon thread: fires even if the main thread is blocked inside
        # a hung tunnel RPC that never returns (signals can't interrupt
        # a GIL-releasing C call that never completes).
        deadline = _T_START + _BUDGET_S
        while True:
            dt = deadline - time.perf_counter()
            if dt <= 0:
                _die("watchdog budget exhausted")
            time.sleep(min(dt, 5.0))

    threading.Thread(target=watchdog, daemon=True).start()


def stage(name: str, fn, min_budget_s: float):
    """Run an extra stage if at least min_budget_s of wall clock remains;
    failures and skips degrade to a stderr line, never to data loss."""
    rem = remaining()
    if rem < min_budget_s:
        log(f"stage {name}: SKIPPED ({rem:.0f}s left < {min_budget_s:.0f}s budget)")
        return
    t0 = time.perf_counter()
    try:
        fn()
        _STAGES_DONE.append(name)
        log(f"stage {name}: done in {time.perf_counter() - t0:.1f}s")
    except Exception as e:
        log(f"stage {name}: FAILED after {time.perf_counter() - t0:.1f}s: {e!r}")


# ---------------------------------------------------------------------------
# Stages
# ---------------------------------------------------------------------------

def check_compiled_kernels():
    """On-TPU equality gate for the COMPILED Pallas cost-volume kernel
    (fwd + both bwd kernels) vs the XLA formulation — interpret-mode
    tests don't exercise Mosaic compilation (VERDICT r1 weak #3)."""
    import jax
    import jax.numpy as jnp
    from qpwcnet_tpu.ops.cost_volume import cost_volume_xla
    from qpwcnet_tpu.ops.pallas.cost_volume_kernel import cost_volume_pallas

    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    prv = jax.random.normal(k1, (2, 56, 128, 32), jnp.float32)
    nxt = jax.random.normal(k2, (2, 56, 128, 32), jnp.float32)
    o_x = cost_volume_xla(prv, nxt, 4)
    o_p = cost_volume_pallas(prv, nxt, 4)
    fwd_err = float(jnp.max(jnp.abs(o_x - o_p)))

    def loss(op):
        return lambda p, n: jnp.sum(jnp.sin(op(p, n, 4)))

    gx = jax.grad(loss(cost_volume_xla), (0, 1))(prv, nxt)
    gp = jax.grad(loss(cost_volume_pallas), (0, 1))(prv, nxt)
    dprv_err = float(jnp.max(jnp.abs(gx[0] - gp[0])))
    dnxt_err = float(jnp.max(jnp.abs(gx[1] - gp[1])))
    log(f"compiled-kernel equality vs XLA: fwd {fwd_err:.2e} "
        f"dprv {dprv_err:.2e} dnxt {dnxt_err:.2e}")
    assert fwd_err < 1e-4 and dprv_err < 1e-4 and dnxt_err < 1e-4, (
        fwd_err, dprv_err, dnxt_err)
    RESULT["pallas_equality_max_err"] = float(max(fwd_err, dprv_err, dnxt_err))

    # Stem kernel (round 5): Mosaic-compiled fused DownConv stage vs the
    # exact conv composition, in f32 so the tolerance is meaningful.
    from qpwcnet_tpu.models.blocks import DownConv
    from qpwcnet_tpu.ops.pallas.stem_kernel import downconv_stage_pallas

    x = jax.random.normal(k1, (2, 64, 128, 3), jnp.float32)
    m = DownConv(16, use_normalizer=False, dtype=jnp.float32)
    v = m.init(jax.random.key(3), x)
    ref = m.apply(v, x)
    got = downconv_stage_pallas(x, v["params"], dtype=jnp.float32)
    stem_err = float(jnp.max(jnp.abs(ref - got)))
    log(f"compiled stem-kernel equality (f32): {stem_err:.2e}")
    assert stem_err < 1e-4, stem_err
    RESULT["stem_equality_max_err"] = stem_err


def bench_train_steps(dtype):
    """Configs 3-4 of BASELINE.json: supervised flow train step
    (256x512, bs=16 — reference train.py:503) and interp pretrain step
    (256x512, bs=8 — reference pre_train.py:32). The evolving TrainState
    is itself the serial chain (params change every step), so repeated
    calls can never be replayed from the result cache."""
    import jax
    import jax.numpy as jnp
    from qpwcnet_tpu.models import build_flow_net, build_interpolator
    from qpwcnet_tpu.train.train_state import (
        create_flow_train_state, make_flow_train_step,
        make_interp_train_step,
    )

    rng = np.random.RandomState(0)
    for name, build, bs, batch_keys, min_rem in (
        ("train_flow", build_flow_net, 16, ("ims", "flo"), 60.0),
        ("pretrain_interp", build_interpolator, 8, ("ims", "mid"), 60.0),
    ):
        if remaining() < min_rem:
            log(f"{name}: SKIPPED ({remaining():.0f}s left)")
            continue
        model, variables = build(jax.random.key(0), (256, 512), dtype=dtype)
        state = create_flow_train_state(model, variables)
        step = jax.jit(make_flow_train_step() if name == "train_flow"
                       else make_interp_train_step())
        batch = {
            "ims": jnp.asarray(rng.uniform(
                -0.5, 0.5, (bs, 256, 512, 6)).astype(np.float32)),
        }
        if "flo" in batch_keys:
            batch["flo"] = jnp.asarray(rng.uniform(
                -8, 8, (bs, 256, 512, 2)).astype(np.float32))
        else:
            batch["mid"] = jnp.asarray(rng.uniform(
                -0.5, 0.5, (bs, 256, 512, 3)).astype(np.float32))

        t0 = time.perf_counter()
        state, metrics = step(state, batch)
        jax.block_until_ready(state.params)
        log(f"{name}: compile+first-step {time.perf_counter() - t0:.1f}s "
            f"loss={float(metrics['loss']):.4f}")
        best_dt = float("inf")
        for w in range(4):
            t0 = time.perf_counter()
            for _ in range(6):
                state, metrics = step(state, batch)
            float(metrics["loss"])  # host readout = the only real sync
            best_dt = min(best_dt, (time.perf_counter() - t0) / 6)
        img_s = bs / best_dt
        log(f"{name}: {best_dt * 1e3:.2f} ms/step -> {img_s:.1f} img/s "
            f"(reference pretrain ~6.6 img/s)")
        RESULT[f"{name}_img_per_s"] = round(img_s, 2)


def bench_int8(hw, batch):
    """Config 5 of BASELINE.json: true-int8 inference (QAT deployment
    path; int8 x int8 -> int32 MXU convs end-to-end incl. the decoder's
    transpose convs). Also measures int8 + cv_impl='fast' (VERDICT r4
    task 4: the fused warp+correlate kernel removes exactly the float
    warp/cost-volume boundary the int8 account blames)."""
    import jax
    import jax.numpy as jnp
    from qpwcnet_tpu.models import build_flow_net
    from qpwcnet_tpu.quantize import QuantConfig

    # bf16 inter-conv activations: the model is HBM-bound and int8
    # quantization error dwarfs bf16 rounding, so f32 activations would
    # just double the bandwidth.
    base_model, variables = build_flow_net(
        jax.random.key(0), hw, dtype=jnp.bfloat16,
        quant=QuantConfig(mode="int8"))

    rng = np.random.RandomState(0)
    for name, model, min_rem in (
        ("int8", base_model, 60.0),
        ("int8_fused", base_model.clone(cv_impl="fast"), 120.0),
    ):
        if remaining() < min_rem:
            log(f"{name}: SKIPPED ({remaining():.0f}s left)")
            continue

        # One jitted dispatch per iteration incl. the chain feedback
        # (the x*1.001 term keeps the chain evolving even if out == 0
        # from the zero-init flow heads — otherwise identical calls hit
        # the tunnel cache).
        @jax.jit
        def chained(variables, x, _m=model):
            out = _m.apply(variables, x, train=False)
            x2 = x * 1.001 + 1e-2 * jnp.concatenate([out, out, out],
                                                    axis=-1)
            return x2, jnp.sum(x2[0, 0, :2])

        x = jnp.asarray(rng.uniform(
            -0.5, 0.5, (batch, hw[0], hw[1], 6)).astype(np.float32))
        t0 = time.perf_counter()
        x, s = chained(variables, x)
        jax.block_until_ready(x)
        log(f"{name}: compile+first-run {time.perf_counter() - t0:.1f}s")
        best_dt = float("inf")
        for w in range(4):
            n_iter = 2 if w == 0 else 6
            t0 = time.perf_counter()
            for _ in range(n_iter):
                x, s = chained(variables, x)
            float(s)  # host readout = the only real sync
            best_dt = min(best_dt, (time.perf_counter() - t0) / n_iter)
        pairs_s = batch / best_dt
        log(f"{name} inference: {best_dt * 1e3:.2f} ms -> "
            f"{pairs_s:.1f} pairs/s")
        RESULT[f"{name}_pairs_per_s"] = round(pairs_s, 2)


def main():
    _install_guards()

    import jax
    import jax.numpy as jnp
    from qpwcnet_tpu.models import build_flow_net
    from qpwcnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    # Canonical headline config; env overrides exist ONLY for debugging
    # the harness itself on CPU (never set by the driver).
    hw = tuple(int(v) for v in os.environ.get("BENCH_HW", "448,1024").split(","))
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    # bf16 compute: 94ms vs 106ms f32 at this shape (HBM-bandwidth-bound
    # model; params/BN/flow-heads stay f32 inside the blocks)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    log(f"backend={jax.default_backend()} shape={hw} batch={batch} "
        f"compute_dtype={dtype.__name__} budget={_BUDGET_S:.0f}s")

    # ----- HEADLINE stage: runs first, before any gate or extra --------
    # stem_stages=2: the fused Pallas encoder-stem kernel (round 5,
    # ops/pallas/stem_kernel.py) — numerically the SAME computation as
    # the conv path (equality tests + on-TPU probe in
    # artifacts/ab_stem.py), so the headline stays the exact-semantics
    # path. Measured: 70.8 ms exact-conv -> 65.5 ms with the stem.
    stem = 2 if jax.default_backend() == "tpu" else 0
    model, variables = build_flow_net(jax.random.key(0), hw, dtype=dtype,
                                      stem_stages=stem)

    # Timed with a serial output->input dependency chain: each step's
    # input derives from the previous step's flow. This defeats both
    # async-dispatch pipelining AND the remote tunnel's result caching
    # of repeated identical executions (which otherwise fakes a ~400x
    # speedup). The x*1.001 term keeps the chain evolving even when the
    # model output is exactly zero (fresh zero-init flow heads would
    # otherwise make every call identical and cache-hit). The feedback
    # is JITTED INTO the forward: one dispatch per iteration — eager
    # feedback ops each paid a tunnel round trip and their own
    # mini-compiles, which on a degraded tunnel starved the round-3/4
    # window loop entirely. It is also the ONLY full-model compile of
    # the headline stage (a separate plain-forward warmup would double
    # the multi-minute remote compile cost).
    # The readout scalar is computed INSIDE the jitted program: any
    # eager mini-op (slice, sum) on the chain state pays its own remote
    # mini-compile + transfer, measured ~460 s on a loaded tunnel.
    @jax.jit
    def chained(variables, x):
        out = model.apply(variables, x, train=False)
        x2 = x * 1.001 + 1e-3 * jnp.concatenate([out, out, out],
                                                axis=-1)
        return x2, jnp.sum(x2[0, 0, :2])

    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.uniform(-0.5, 0.5,
                    (batch, hw[0], hw[1], 6)).astype(np.float32)
    )

    t0 = time.perf_counter()
    x, s = chained(variables, x)
    jax.block_until_ready(x)
    log(f"chained compile+first-run: {time.perf_counter() - t0:.1f}s")

    # Best-of-N windows: the shared tunnel shows >2x run-to-run
    # variance; the fastest window is closest to true device speed.
    # Window 0 is short so a headline value lands in RESULT early; the
    # loop is budget-aware — on a badly degraded tunnel we keep whatever
    # windows completed instead of losing the round.
    best_dt = float("inf")
    for w in range(5):
        n_iter = 2 if w == 0 else 8
        t0 = time.perf_counter()
        for _ in range(n_iter):
            x, s = chained(variables, x)
        # Host readout is the sync: block_until_ready on axon tunnel
        # buffers has been observed to return before device completion
        # (measured 0.3 ms/step "timings"); a scalar device->host read
        # cannot lie. Cost ~1 RTT amortized over the window. It doubles
        # as the finiteness gate: a NaN anywhere in the model output
        # propagates into the chain and this sum.
        readout = float(s)
        assert np.isfinite(readout), readout
        dt = (time.perf_counter() - t0) / n_iter
        log(f"window {w}: chained step={dt * 1e3:.2f} ms "
            f"(t+{time.perf_counter() - _T_START:.0f}s)")
        best_dt = min(best_dt, dt)
        pairs_per_sec = batch / best_dt
        RESULT["value"] = round(pairs_per_sec, 2)
        RESULT["vs_baseline"] = round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2)
        RESULT["timing_windows"] = w + 1
        if w >= 1 and remaining() < 0.25 * _BUDGET_S:
            log(f"window loop: stopping early ({remaining():.0f}s left)")
            break
    _STAGES_DONE.append("headline")
    log(f"best: {best_dt * 1e3:.2f} ms -> {RESULT['value']} pairs/s")

    # ----- EXTRAS: each budgeted, each optional ------------------------

    def hbm_and_mfu():
        # HBM-bandwidth utilization and FLOP-based MFU of the headline
        # forward (XLA's own estimates over the measured step time).
        # The analysis compiles the chained program — the same HLO the
        # windows ran, already in the persistent compile cache.
        from qpwcnet_tpu.utils.profiling import cost_analysis
        ca = cost_analysis(chained, variables, x)
        if "bytes accessed" in ca:
            gb = float(ca["bytes accessed"]) / 1e9
            util = gb / best_dt / V5E_PEAK_HBM_GBPS
            log(f"bytes accessed {gb:.2f} GB -> "
                f"{gb / best_dt:.0f} GB/s = {util * 100:.0f}% of v5e peak")
            RESULT["hbm_gb_per_s"] = round(gb / best_dt, 1)
            RESULT["hbm_util_vs_v5e_peak"] = round(util, 3)
        if "flops" in ca:
            flops = float(ca["flops"])
            mfu = flops / best_dt / V5E_PEAK_BF16_FLOPS
            log(f"flops {flops / 1e9:.1f} GF -> "
                f"{flops / best_dt / 1e12:.2f} TF/s = MFU {mfu * 100:.1f}% "
                f"of v5e bf16 peak")
            RESULT["mfu_vs_v5e_peak"] = round(mfu, 4)

    def fused_headline():
        # North-star fast path (BASELINE.json): cv_impl='fast' — the
        # fused warp+correlate Pallas kernel at the FINEST level only
        # (measured per-level dispatch, artifacts/ab_cv_dispatch.py:
        # fused-everywhere 66.9 ms, fused-finest-only 57.8 ms on the
        # conv-stem model) — on top of the stem-kernel headline model.
        # Window-warp approximation at that level (models/blocks.py).
        fmodel = model.clone(cv_impl="fast")

        @jax.jit
        def fchained(variables, x):
            out = fmodel.apply(variables, x, train=False)
            x2 = x * 1.001 + 1e-3 * jnp.concatenate(
                [out, out, out], axis=-1)
            return x2, jnp.sum(x2[0, 0, :2])

        xf = jnp.asarray(rng.uniform(
            -0.5, 0.5, (batch, hw[0], hw[1], 6)).astype(np.float32))
        t0 = time.perf_counter()
        xf, sf = fchained(variables, xf)
        jax.block_until_ready(xf)
        log(f"fused: compile+first-run {time.perf_counter() - t0:.1f}s")
        best = float("inf")
        for w in range(3):
            n_iter = 2 if w == 0 else 8
            t0 = time.perf_counter()
            for _ in range(n_iter):
                xf, sf = fchained(variables, xf)
            assert np.isfinite(float(sf))
            best = min(best, (time.perf_counter() - t0) / n_iter)
            if remaining() < 30.0:
                break
        log(f"fused headline: {best * 1e3:.2f} ms -> "
            f"{batch / best:.1f} pairs/s")
        RESULT["fused_pairs_per_s"] = round(batch / best, 2)

    # Most-informative extras first: on a degraded tunnel the tail
    # stages are the ones that get skipped.
    stage("hbm_mfu", hbm_and_mfu, min_budget_s=30.0)
    stage("fused_headline", fused_headline, min_budget_s=240.0)
    # int8 before train_steps: the r03/r04 train stage spent ~870s on
    # remote compiles and starved the int8 stage, leaving the
    # "int8 faster than bf16" question unmeasured since r02.
    stage("int8", lambda: bench_int8(hw, batch), min_budget_s=150.0)
    stage("train_steps", lambda: bench_train_steps(dtype), min_budget_s=240.0)
    stage("pallas_equality", check_compiled_kernels, min_budget_s=180.0)

    emit(partial=False)


if __name__ == "__main__":
    main()
