"""Supervised optical-flow training app
(parity with qpwcnet/app/optical_flow/train.py:main()).

Pipeline: FlyingThings3D set-file or Sintel TFRecord shards -> host
decode threads -> device augmentation (flip/scale-crop/color, NaN scrub)
-> jitted train step (multiscale Huber loss, l2 reg, NaN-grad scrub, AGC,
Adam) over a data-parallel mesh -> Orbax checkpoints + TB metrics with
flow-RGB renders. Synthetic data mode (--data synthetic) exercises the
full loop without datasets.

Run: python -m qpwcnet_tpu.apps.train_flow --data synthetic --steps 20
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from qpwcnet_tpu.utils.config import with_args


@dataclasses.dataclass
class Settings:
    """Flow training settings (the hardcoded tuple of train.py:502-514,
    now a real config)."""

    # 'synthetic': on-device NON-UNIFORM smooth flow fields
    #   (data/synthetic.py — the convergence-evidence task);
    # 'synthetic-uniform': round-2 host generator, one integer shift per
    #   sample (kept for the convert_quant EPE gate's fixed distribution);
    # 'fc3d' | 'sintel': real datasets.
    data: str = "synthetic"
    max_disp: float = 24.0   # synthetic flow magnitude bound (px)
    data_path: str = ""      # fc3d set file / sintel shard glob
    batch_size: int = 16
    learning_rate: float = 1e-4
    steps: int = 100_000
    height: int = 256
    width: int = 512
    base_scale: float = 1.0   # 0.56 for FlyingThings3D (train.py:147)
    # 'auto' = augmentation ON for real datasets (parity with the
    # reference's pipeline), OFF for synthetic data: the generator
    # already randomizes geometry/photometry per sample, and the
    # scale-and-crop's bilinear resampling low-passes the texture from
    # 21% cost-volume matching contrast to ~6% — measurably pushing
    # training back below the ignition threshold (RESULTS.md round-3
    # diagnosis). 'on'/'off' force it.
    augment: str = "auto"
    log_every: int = 100
    ckpt_every: int = 2000
    run_root: str = "/tmp/qpwcnet_tpu/run"
    load_ckpt: str = ""       # run dir to resume / transfer from
    transfer_from_interp: bool = False
    compute_dtype: str = "float32"  # or 'bfloat16'
    # Head parameterization (models.blocks.OptFlow/UpFlowBlock).
    # Training from scratch REQUIRES the trainable mode: measured on
    # fresh synthetic data, reference parity ('diag', residual off)
    # diverges to NaN and unit-without-residual stalls at the
    # predict-zero baseline, while unit+residual converges (RESULTS.md
    # round-3 diagnosis). Set head_scale='diag', residual=False only
    # when fine-tuning from an interp-pretrained reference-parity
    # checkpoint (param shapes are identical across modes).
    head_scale: str = "unit"
    residual: bool = True
    # 'auto': plain Adam (NaN-scrub + adam, no AGC, no l2) for
    # synthetic from-scratch training — the measured ignition recipe —
    # and the reference chain (NaN-scrub + AGC + Adam + l2 4e-6,
    # train.py:120,294-296) for datasets/fine-tuning. 'plain'/
    # 'reference' force it.
    optimizer: str = "auto"
    # Synthetic-mode resolution curriculum: comma-separated step counts
    # for the 1/4-res and 1/2-res warmup stages (e.g. '5000,4000'; ''
    # disables). Ignition at full 256x512/disp-24 is unreliable from
    # scratch, but parameters are resolution-independent: ignite at
    # (h/4, w/4, disp/3, lr*10/3), consolidate at (h/2, w/2, disp/2,
    # lr*5/3), then train at full config. Measured: heldout EPE 1.85 vs
    # a 12.15 predict-zero baseline within 500 full-res steps, where
    # 2500 from-scratch full-res steps sat at the baseline (RESULTS.md).
    # Skipped automatically when resuming from a checkpoint.
    curriculum: str = "5000,4000"
    seed: int = 0
    # Quantization-aware training as a first-class, resumable mode (the
    # reference trains its QAT model with the same fit loop,
    # convert_tflite.py:145-208). quant_stats ranges are checkpointed;
    # --load-ckpt may point at a FLOAT run to start a QAT fine-tune.
    qat: bool = False
    # Synthetic mode only: fuse data generation + preprocessing + this
    # many train steps into ONE jitted lax.scan dispatch. Each separate
    # device dispatch pays the remote-tunnel round-trip (~100 ms); the
    # unfused loop measured 35 img/s against the 101 img/s step.
    steps_per_call: int = 50
    # BN-recalibration forward passes run immediately before the FINAL
    # checkpoint save, so the stored artifact carries deployment-ready
    # running statistics (momentum-.99 EMAs lag the converged model by
    # ~100 steps; measured 328 vs 5.5 EPE on stale stats, RESULTS.md).
    # Periodic (resume) checkpoints are NOT recalibrated — resume
    # semantics stay bit-exact. 0 disables. Recalibration uses
    # UNAUGMENTED batches (the deployment distribution).
    recalibrate_final: int = 16


def _synthetic_batches(cfg: Settings, start_step: int = 0):
    """Learnable synthetic pairs: smooth random textures displaced by a
    known integer flow (nxt[p] shifted so prv[p] == nxt[p + flow]), for
    end-to-end training validation without datasets.

    Per-batch-index seeding makes the stream RESUMABLE: a run restored
    at step k sees exactly the batches an uninterrupted run would have
    seen from step k, so interrupt+resume is bit-reproducible."""
    h, w = cfg.height, cfg.width
    idx = start_step
    while True:
        rng = np.random.RandomState(
            (cfg.seed * 1_000_003 + idx) % (2**31 - 1))
        idx += 1
        # smooth textures: block-upsampled noise (correlation helps
        # matching); vectorized over the batch — the per-sample
        # np.kron loop this replaces capped end-to-end training at
        # ~17 img/s against a 101 img/s device step.
        base = rng.uniform(
            0, 255, (cfg.batch_size, h // 4, w // 4, 3))
        prv = base.repeat(4, axis=1).repeat(4, axis=2)[:, :h, :w]
        prv = prv.astype(np.uint8)
        uv = rng.randint(-8, 9, size=(cfg.batch_size, 2))
        ims = np.empty((cfg.batch_size, h, w, 6), np.uint8)
        flo = np.empty((cfg.batch_size, h, w, 2), np.float32)
        for k in range(cfg.batch_size):
            u, v = int(uv[k, 0]), int(uv[k, 1])
            # prv[i, j] == nxt[i + v, j + u]  =>  nxt = roll(prv, (v, u))
            ims[k, ..., :3] = prv[k]
            ims[k, ..., 3:] = np.roll(prv[k], shift=(v, u), axis=(0, 1))
            flo[k] = uv[k].astype(np.float32)
        yield ims, flo


def _dataset_batches(cfg: Settings):
    from qpwcnet_tpu.data.pipeline import PrefetchLoader

    if cfg.data == "fc3d":
        from qpwcnet_tpu.data.fchairs3d import decode_pair, read_set_file

        pairs = read_set_file(cfg.data_path)

        def sample(i):
            return decode_pair(*pairs[i])

        loader = PrefetchLoader(
            sample, len(pairs), cfg.batch_size,
            shard_index=jax.process_index(),
            shard_count=jax.process_count())
    elif cfg.data == "sintel":
        from pathlib import Path

        from qpwcnet_tpu.data.tfrecord import (
            parse_sintel_example,
            tfrecord_iterator,
        )

        shards = sorted(Path().glob(cfg.data_path))
        records = [
            r for s in shards for r in tfrecord_iterator(s)
        ]

        def sample(i):
            return parse_sintel_example(records[i])

        loader = PrefetchLoader(
            sample, len(records), cfg.batch_size,
            shard_index=jax.process_index(),
            shard_count=jax.process_count())
    else:
        raise ValueError(f"unknown data source {cfg.data!r}")
    return iter(loader)


def _resolve_optimizer(cfg: Settings):
    """('plain'|'reference', l2_gamma) per cfg.optimizer/'auto'."""
    plain = cfg.optimizer == "plain" or (
        cfg.optimizer == "auto" and cfg.data == "synthetic")
    return ("plain" if plain else "reference"), (0.0 if plain else 4e-6)


def _make_tx(kind: str, lr: float):
    import optax

    from qpwcnet_tpu.train.agc import zero_nan_grads
    from qpwcnet_tpu.train.train_state import default_optimizer

    if kind == "plain":
        return optax.chain(zero_nan_grads(), optax.adam(lr))
    return default_optimizer(lr)


def _run_synthetic_curriculum(cfg: Settings, model, state, l2_gamma):
    """Resolution-curriculum warmup (synthetic mode, fresh runs only):
    segment-fused scan stages at 1/4 and 1/2 resolution with scaled
    max_disp and learning rate, fresh Adam state per stage. Parameters
    are resolution-independent, so the ignited weights transfer
    directly to the full-resolution fused loop.

    Segment-fused like the full-res loop: `steps_per_call` batches are
    pre-generated in one jitted call and the train step is lax.scan'd
    over the STACKED batches — the generator never runs inside the
    scan body, which avoids the small-resolution scan-context kernel
    fault (XLA:TPU worker crash when `synthetic_flow_batch` is traced
    inside a scan at 64x128/b16; scanning over pre-stacked arrays is
    fine). Fusing matters doubly here: each device dispatch pays the
    remote-tunnel round-trip (measured 0.1-1.7 s depending on tunnel
    load), and the eager per-step spelling costs 2+ dispatches/step."""
    import functools

    from qpwcnet_tpu.data.synthetic import (
        synthetic_flow_batch, zero_baseline_epe)
    from qpwcnet_tpu.train import make_flow_train_step
    from qpwcnet_tpu.train.losses import epe_error as _epe

    stage_steps = [int(s) for s in cfg.curriculum.split(",") if s]
    divisors = (4, 2)[:len(stage_steps)]
    disp_div = {4: 3.0, 2: 2.0}
    lr_mult = {4: 10.0 / 3.0, 2: 5.0 / 3.0}
    kind, _ = _resolve_optimizer(cfg)

    for n_steps, div in zip(stage_steps, divisors):
        if cfg.height % (32 * div) or cfg.width % (32 * div):
            print(f"[curriculum] skip 1/{div} stage: "
                  f"{cfg.height}x{cfg.width} not divisible by "
                  f"{32*div} (the 5-level pyramid needs /32 dims)",
                  file=sys.stderr)
            continue
        h, w = cfg.height // div, cfg.width // div
        disp = cfg.max_disp / disp_div[div]
        lr = cfg.learning_rate * lr_mult[div]
        tx = _make_tx(kind, lr)
        state = state.replace(tx=tx, opt_state=tx.init(state.params))

        held_u8, held_flo = synthetic_flow_batch(
            jax.random.key(cfg.seed + 999), cfg.batch_size, h, w,
            max_disp=disp)
        held = {"ims": held_u8.astype(jnp.float32) / 255.0 - 0.5,
                "flo": held_flo}
        zb = float(zero_baseline_epe(held_flo))

        @jax.jit
        def eval_epe(st, held=held):
            v = {"params": st.params, "batch_stats": st.batch_stats}
            pred = model.apply(v, held["ims"], train=False)
            return _epe(held["flo"], pred)

        key = jax.random.key(cfg.seed + 2)
        raw_step = make_flow_train_step(l2_gamma)

        @functools.partial(jax.jit, static_argnames=("k",))
        def run_k(st, i0, k: int, _div=div, _h=h, _w=w, _disp=disp):
            # Stacked generation OUTSIDE the scan (see docstring); the
            # per-stage seed stream folds (stage, step) so stages never
            # replay each other's fields. Images stay uint8 in the
            # stacked segment (4x less HBM than pre-converted float32);
            # the /255-0.5 conversion happens per step in the scan body.
            def gen(j):
                ims_u8, flo = synthetic_flow_batch(
                    jax.random.fold_in(
                        jax.random.fold_in(key, _div), i0 + j),
                    cfg.batch_size, _h, _w, max_disp=_disp)
                return {"ims_u8": ims_u8, "flo": flo}
            batches = jax.vmap(gen)(jnp.arange(k))

            def body(s, b):
                batch = {
                    "ims": b["ims_u8"].astype(jnp.float32) / 255.0 - 0.5,
                    "flo": b["flo"],
                }
                s, metrics = raw_step(s, batch)
                return s, metrics
            st, ms = jax.lax.scan(body, st, batches)
            return st, jax.tree_util.tree_map(jnp.mean, ms)

        t0 = time.time()
        spc = max(1, min(cfg.steps_per_call, cfg.log_every))
        i = 0
        while i < n_steps:
            k = min(spc, n_steps - i)
            state, m = run_k(state, jnp.asarray(i), k)
            i += k
            if i % cfg.log_every < k:
                print(f"[curriculum 1/{div}] step {i}: "
                      f"loss={float(m['loss']):.5f} "
                      f"epe={float(m['epe']):.3f} "
                      f"epe_eval={float(eval_epe(state)):.3f} "
                      f"epe_zero={zb:.3f} "
                      f"({cfg.batch_size*i/(time.time()-t0):.1f} "
                      f"img/s)", file=sys.stderr, flush=True)

    # hand back with a fresh optimizer at the configured lr
    tx = _make_tx(kind, cfg.learning_rate)
    return state.replace(tx=tx, opt_state=tx.init(state.params))


def _run_synthetic_fused(cfg: Settings, model, state, ckpt, writer,
                         step0: int, l2_gamma: float = 4e-6):
    """Synthetic-mode training with everything on-device: batch
    generation, augmentation/preprocess, and `steps_per_call`
    consecutive train steps run inside ONE jitted lax.scan. The host
    only dispatches segments and logs — the TPU-idiomatic shape of this
    loop (minimise host<->device transfers; the remote tunnel charges a
    round-trip per dispatch).

    Streams stay resumable: batch i and aug-key i derive from
    fold_in(key, i) by GLOBAL step index, so interrupt+resume replays
    the uninterrupted run exactly.
    """
    import functools

    from qpwcnet_tpu.data.pipeline import preprocess_flow_batch
    from qpwcnet_tpu.data.synthetic import (
        synthetic_flow_batch, zero_baseline_epe)
    from qpwcnet_tpu.train import make_flow_train_step
    from qpwcnet_tpu.train.losses import epe_error as _epe

    raw_step = make_flow_train_step(l2_gamma)
    data_key = jax.random.key(cfg.seed + 2)
    aug_key = jax.random.key(cfg.seed + 1)
    augment = cfg.augment == "on"  # 'auto' -> off for synthetic

    def gen_batch(i):
        ims_u8, flo = synthetic_flow_batch(
            jax.random.fold_in(data_key, i), cfg.batch_size,
            cfg.height, cfg.width, max_disp=cfg.max_disp)
        return preprocess_flow_batch(
            jax.random.fold_in(aug_key, i), ims_u8, flo,
            out_hw=(cfg.height, cfg.width),
            base_scale=cfg.base_scale, augment=augment)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_steps(st, i0, k: int):
        def body(s, j):
            s, metrics = raw_step(s, gen_batch(i0 + j))
            return s, metrics
        st, ms = jax.lax.scan(body, st, jnp.arange(k))
        return st, jax.tree_util.tree_map(jnp.mean, ms)

    # Held-out eval batch (never trained on): eval-mode EPE uses the
    # RUNNING BN stats, as deployment would — logged beside the
    # train-mode EPE to expose BN train/eval drift.
    eval_ims, eval_flo = synthetic_flow_batch(
        jax.random.key(cfg.seed + 999), cfg.batch_size,
        cfg.height, cfg.width, max_disp=cfg.max_disp)
    eval_batch = {
        "ims": eval_ims.astype(jnp.float32) / 255.0 - 0.5,
        "flo": eval_flo,
    }

    @jax.jit
    def eval_epe(st):
        v = {"params": st.params, "batch_stats": st.batch_stats}
        if st.quant_stats:
            v["quant_stats"] = st.quant_stats
        return _epe(eval_batch["flo"],
                    model.apply(v, eval_batch["ims"], train=False))

    epe_zero = float(zero_baseline_epe(eval_batch["flo"]))
    spc = max(1, min(cfg.steps_per_call, cfg.log_every))
    t0 = time.time()
    i = step0
    try:
        while i < cfg.steps:
            k = min(spc, cfg.steps - i)
            state, metrics = run_steps(state, jnp.asarray(i), k)
            i += k
            if i % cfg.log_every < k:
                m = {kk: float(v) for kk, v in metrics.items()}
                m["epe_eval"] = float(eval_epe(state))
                m["epe_zero"] = epe_zero
                rate = (cfg.batch_size * (i - step0)) / (
                    time.time() - t0)
                writer.scalars(i, {**m, "images_per_sec": rate})
                print(f"step {i}: loss={m['loss']:.4f} "
                      f"epe={m['epe']:.3f} "
                      f"epe_eval={m['epe_eval']:.3f} "
                      f"epe_zero={m['epe_zero']:.3f} "
                      f"({rate:.1f} img/s)",
                      file=sys.stderr)
            if i % cfg.ckpt_every < k:
                ckpt.save(i, jax.device_get(state))
    except KeyboardInterrupt:
        print("interrupted; saving", file=sys.stderr)
    if cfg.recalibrate_final:
        from qpwcnet_tpu.train.train_state import recalibrate_batch_stats

        def calib_ims():
            for j in range(cfg.recalibrate_final):
                ims_u8, _ = synthetic_flow_batch(
                    jax.random.fold_in(data_key, 1_000_000_000 + j),
                    cfg.batch_size, cfg.height, cfg.width,
                    max_disp=cfg.max_disp)
                yield ims_u8.astype(jnp.float32) / 255.0 - 0.5
        state = recalibrate_batch_stats(
            state, calib_ims(), cfg.recalibrate_final)
        print(f"recalibrated BN stats over {cfg.recalibrate_final} "
              f"batches before final save", file=sys.stderr)
    ckpt.save(int(jax.device_get(state.step)), jax.device_get(state))
    ckpt.wait()
    writer.close()


@with_args(Settings)
def main(cfg: Settings):
    from qpwcnet_tpu.data.pipeline import preprocess_flow_batch
    from qpwcnet_tpu.models import build_flow_net
    from qpwcnet_tpu.parallel import (
        make_mesh_for_batch, make_parallel_step, put_batch,
        replicate)
    from qpwcnet_tpu.train import (
        create_flow_train_state, make_flow_train_step)
    from qpwcnet_tpu.train.checkpoint import CheckpointManager
    from qpwcnet_tpu.train.metrics import MetricWriter
    from qpwcnet_tpu.utils.runs import setup_run_dir, snapshot_config

    paths = setup_run_dir(cfg.run_root)
    snapshot_config(paths["run"], cfg)
    print(f"run dir: {paths['run']}", file=sys.stderr)

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    quant = None
    if cfg.qat:
        from qpwcnet_tpu.quantize import QuantConfig

        quant = QuantConfig()
    model, variables = build_flow_net(
        jax.random.key(cfg.seed), (cfg.height, cfg.width), dtype=dtype,
        quant=quant, head_scale=cfg.head_scale, residual=cfg.residual,
    )
    opt_kind, l2_gamma = _resolve_optimizer(cfg)
    state = create_flow_train_state(
        model, variables, tx=_make_tx(opt_kind, cfg.learning_rate))

    ckpt = CheckpointManager(paths["ckpt"])
    if cfg.load_ckpt:
        src_mgr = CheckpointManager(cfg.load_ckpt)
        if cfg.transfer_from_interp:
            from qpwcnet_tpu.models import build_interpolator
            from qpwcnet_tpu.train import create_flow_train_state as cfts
            from qpwcnet_tpu.train.checkpoint import transfer_params

            imodel, ivars = build_interpolator(
                jax.random.key(0), (cfg.height, cfg.width), dtype=dtype)
            istate = cfts(imodel, ivars)
            istate = src_mgr.restore(istate)
            state = state.replace(params=transfer_params(
                istate.params, state.params))
        else:
            state = src_mgr.restore(state)
        src_mgr.close()
    else:
        state = ckpt.restore(state)  # auto-resume

    writer = MetricWriter(paths["log"])
    step0 = int(jax.device_get(state.step))
    if cfg.data == "synthetic":
        # Fully-fused single-device loop: generation + preprocessing +
        # steps_per_call train steps inside one jitted lax.scan — one
        # tunnel dispatch per segment instead of 3+ per step.
        if cfg.curriculum and step0 == 0 and not cfg.load_ckpt:
            state = _run_synthetic_curriculum(cfg, model, state,
                                              l2_gamma)
        _run_synthetic_fused(cfg, model, state, ckpt, writer, step0,
                             l2_gamma)
        return

    mesh = make_mesh_for_batch(cfg.batch_size)
    state = replicate(state, mesh)
    step_fn = make_parallel_step(make_flow_train_step(), mesh)

    if cfg.data == "synthetic-uniform":
        from qpwcnet_tpu.data.pipeline import prefetch_iterator

        batches = prefetch_iterator(
            _synthetic_batches(cfg, start_step=step0))
    else:
        batches = _dataset_batches(cfg)

    # Eval-mode forward (running BN stats, as deployment would run):
    # logged beside the train-mode EPE to catch BN train/eval drift
    # (measured 30x amplification on stale stats, RESULTS.md).
    from qpwcnet_tpu.train.losses import epe_error as _epe

    @jax.jit
    def eval_epe(st, batch):
        v = {"params": st.params, "batch_stats": st.batch_stats}
        if st.quant_stats:
            v["quant_stats"] = st.quant_stats
        return _epe(batch["flo"], model.apply(v, batch["ims"],
                                              train=False))

    key = jax.random.key(cfg.seed + 1)
    t0 = time.time()
    try:
        for i in range(step0, cfg.steps):
            ims_u8, flo = next(batches)
            # fold_in (not split): the aug-key stream is indexed by the
            # global step, so interrupt+resume replays identically.
            sub = jax.random.fold_in(key, i)
            batch = preprocess_flow_batch(
                sub, jnp.asarray(ims_u8), jnp.asarray(flo),
                out_hw=(cfg.height, cfg.width),
                base_scale=cfg.base_scale,
                augment=cfg.augment != "off")  # 'auto' -> on for datasets
            batch = put_batch(batch, mesh)
            state, metrics = step_fn(state, batch)
            if (i + 1) % cfg.log_every == 0:
                from qpwcnet_tpu.data.synthetic import zero_baseline_epe

                m = {k: float(v) for k, v in metrics.items()}
                m["epe_eval"] = float(eval_epe(state, batch))
                m["epe_zero"] = float(zero_baseline_epe(batch["flo"]))
                rate = (cfg.batch_size * (i + 1 - step0)) / (
                    time.time() - t0)
                writer.scalars(i + 1, {**m, "images_per_sec": rate})
                print(f"step {i + 1}: loss={m['loss']:.4f} "
                      f"epe={m['epe']:.3f} "
                      f"epe_eval={m['epe_eval']:.3f} "
                      f"epe_zero={m['epe_zero']:.3f} "
                      f"({rate:.1f} img/s)",
                      file=sys.stderr)
            if (i + 1) % cfg.ckpt_every == 0:
                ckpt.save(i + 1, jax.device_get(state))
    except KeyboardInterrupt:
        # save-on-interrupt (train.py:377-389)
        print("interrupted; saving", file=sys.stderr)
    if cfg.recalibrate_final:
        from qpwcnet_tpu.train.train_state import recalibrate_batch_stats

        state = jax.device_get(state)  # off the mesh for the plain jit

        def calib_ims():
            for j in range(cfg.recalibrate_final):
                ims_u8, flo = next(batches)
                b = preprocess_flow_batch(
                    jax.random.fold_in(key, 1_000_000_000 + j),
                    jnp.asarray(ims_u8), jnp.asarray(flo),
                    out_hw=(cfg.height, cfg.width),
                    base_scale=cfg.base_scale, augment=False)
                yield b["ims"]
        state = recalibrate_batch_stats(
            state, calib_ims(), cfg.recalibrate_final)
        print(f"recalibrated BN stats over {cfg.recalibrate_final} "
              f"batches before final save", file=sys.stderr)
    ckpt.save(int(state.step), jax.device_get(state))
    ckpt.wait()
    writer.close()


if __name__ == "__main__":
    main()
