"""Frame-interpolation pretraining app
(parity with qpwcnet/app/frame_interpolation/pre_train.py:main()):
predict the middle frame of a triplet from bidirectional flow
("Temporal Interpolation as an Unsupervised Pretraining Task").

Datasets: vimeo_triplet / YouTube-VOS / dummy (synthetic). Loss =
AutoResizeMse over all 6 multiscale outputs (pre_train.py:54-72).

Run: python -m qpwcnet_tpu.apps.pretrain_interp --data dummy --steps 10
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
    """Pretraining settings (pre_train.py:28-41 Settings dataclass)."""

    # 'synthetic': on-device constant-velocity triplets
    #   (data/synthetic.py:synthetic_triplet_batch) — pretraining without
    #   datasets, fused-scan loop like train_flow's synthetic mode;
    # 'vimeo' | 'ytvos': real triplet datasets; 'dummy': pipeline smoke.
    data: str = "synthetic"
    max_disp: float = 24.0     # synthetic flow magnitude bound (px)
    data_path: str = ""
    batch_size: int = 8
    learning_rate: float = 1e-4
    steps: int = 100_000
    height: int = 256
    width: int = 512
    augment: bool = True
    # Synthetic mode only: batches generated + trained inside one jitted
    # lax.scan segment (see train_flow.Settings.steps_per_call).
    steps_per_call: int = 50
    log_every: int = 100
    ckpt_every: int = 2000
    run_root: str = "/tmp/qpwcnet_tpu/pretrain"
    load_ckpt: str = ""
    compute_dtype: str = "float32"
    seed: int = 0
    debug_nan: bool = False    # pre_train.py:239-240
    # QAT mode (see train_flow.Settings.qat): ranges are checkpointed,
    # --load-ckpt may point at a float run.
    qat: bool = False
    # BN recalibration passes before the FINAL save (deployment-ready
    # stats; see train_flow.Settings.recalibrate_final). 0 disables.
    recalibrate_final: int = 16
    # Head parameterization (see train_flow.Settings.head_scale).
    # Defaults are exact reference parity — the reference PRETRAINS with
    # this head (pre_train.py builds the stock interpolator) and only
    # then transfers to supervised flow; param shapes are identical
    # across modes so either choice transfers.
    head_scale: str = "diag"
    residual: bool = False


def _make_dataset(cfg: Settings):
    from qpwcnet_tpu.data.triplet import (
        DummyTripletDataset, VimeoTriplet, YoutubeVos)

    if cfg.data == "vimeo":
        return VimeoTriplet(cfg.data_path, "train")
    if cfg.data == "ytvos":
        return YoutubeVos(cfg.data_path, "train")
    return DummyTripletDataset(n=max(cfg.batch_size * 4, 32),
                               hw=(cfg.height, cfg.width))


def _run_synthetic_fused(cfg: Settings, model, state, ckpt, writer,
                         step0: int):
    """Synthetic pretraining with generation + preprocessing +
    `steps_per_call` train steps fused into ONE jitted lax.scan (the
    same dispatch-minimising shape as train_flow._run_synthetic_fused —
    each separate device dispatch pays the remote-tunnel round-trip).

    Streams are resumable: triplet i and aug-key i derive from
    fold_in(key, i) by GLOBAL step index."""
    import functools

    from qpwcnet_tpu.data.pipeline import preprocess_triplet_batch
    from qpwcnet_tpu.data.synthetic import synthetic_triplet_batch
    from qpwcnet_tpu.train import make_interp_train_step
    from qpwcnet_tpu.train.train_state import recalibrate_batch_stats

    raw_step = make_interp_train_step()
    data_key = jax.random.key(cfg.seed + 2)
    aug_key = jax.random.key(cfg.seed + 1)

    def gen_batch(i):
        a, b, c = synthetic_triplet_batch(
            jax.random.fold_in(data_key, i), cfg.batch_size,
            cfg.height, cfg.width, max_disp=cfg.max_disp)
        return preprocess_triplet_batch(
            jax.random.fold_in(aug_key, i), a, b, c,
            augment=cfg.augment)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_steps(st, i0, k: int):
        def body(s, j):
            s, metrics = raw_step(s, gen_batch(i0 + j))
            return s, metrics
        st, ms = jax.lax.scan(body, st, jnp.arange(k))
        return st, jax.tree_util.tree_map(jnp.mean, ms)

    # Held-out eval triplet (never trained on): eval-mode final-scale
    # MSE with running BN stats, as deployment would run.
    ea, eb, ec = synthetic_triplet_batch(
        jax.random.key(cfg.seed + 999), cfg.batch_size,
        cfg.height, cfg.width, max_disp=cfg.max_disp)
    eval_batch = preprocess_triplet_batch(
        jax.random.key(0), ea, eb, ec, augment=False)

    @jax.jit
    def eval_mse(st):
        v = {"params": st.params, "batch_stats": st.batch_stats}
        if st.quant_stats:
            v["quant_stats"] = st.quant_stats
        pred = model.apply(v, eval_batch["ims"], train=False)
        pred = pred[-1] if isinstance(pred, (list, tuple)) else pred
        return jnp.mean(jnp.square(pred - eval_batch["mid"]))

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
                m["mse_eval"] = float(eval_mse(state))
                rate = (cfg.batch_size * (i - step0)) / (time.time() - t0)
                writer.scalars(i, {**m, "images_per_sec": rate})
                print(f"step {i}: loss={m['loss']:.5f} "
                      f"mse_eval={m['mse_eval']:.5f} "
                      f"({rate:.1f} img/s)", file=sys.stderr, flush=True)
            if i % cfg.ckpt_every < k:
                ckpt.save(i, jax.device_get(state))
    except KeyboardInterrupt:
        print("interrupted; saving", file=sys.stderr)
    if cfg.recalibrate_final:
        def calib_ims():
            for j in range(cfg.recalibrate_final):
                a, b, c = synthetic_triplet_batch(
                    jax.random.fold_in(data_key, 1_000_000_000 + j),
                    cfg.batch_size, cfg.height, cfg.width,
                    max_disp=cfg.max_disp)
                yield preprocess_triplet_batch(
                    jax.random.key(0), a, b, c, augment=False)["ims"]
        state = recalibrate_batch_stats(
            state, calib_ims(), cfg.recalibrate_final)
        print(f"recalibrated BN stats over {cfg.recalibrate_final} "
              f"batches before final save", file=sys.stderr)
    ckpt.save(int(jax.device_get(state.step)), jax.device_get(state))
    ckpt.wait()
    writer.close()


@with_args(Settings)
def main(cfg: Settings):
    from qpwcnet_tpu.data.pipeline import (
        PrefetchLoader, preprocess_triplet_batch, triplet_sample_fn)
    from qpwcnet_tpu.models import build_interpolator
    from qpwcnet_tpu.parallel import (
        make_mesh_for_batch, make_parallel_step, put_batch,
        replicate)
    from qpwcnet_tpu.train import (
        create_interp_train_state, make_interp_train_step)
    from qpwcnet_tpu.train.checkpoint import CheckpointManager
    from qpwcnet_tpu.train.metrics import MetricWriter
    from qpwcnet_tpu.utils.runs import setup_run_dir, snapshot_config

    if cfg.debug_nan:
        jax.config.update("jax_debug_nans", True)

    paths = setup_run_dir(cfg.run_root)
    snapshot_config(paths["run"], cfg)
    print(f"run dir: {paths['run']}", file=sys.stderr)

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    quant = None
    if cfg.qat:
        from qpwcnet_tpu.quantize import QuantConfig

        quant = QuantConfig()
    model, variables = build_interpolator(
        jax.random.key(cfg.seed), (cfg.height, cfg.width), dtype=dtype,
        quant=quant, head_scale=cfg.head_scale, residual=cfg.residual)
    state = create_interp_train_state(
        model, variables, learning_rate=cfg.learning_rate)

    ckpt = CheckpointManager(paths["ckpt"])
    if cfg.load_ckpt:
        src = CheckpointManager(cfg.load_ckpt)
        state = src.restore(state)
        src.close()
    else:
        state = ckpt.restore(state)

    writer = MetricWriter(paths["log"])
    if cfg.data == "synthetic":
        # Fully-fused single-device loop (see train_flow's synthetic
        # mode); datasets go through the sharded PrefetchLoader below.
        _run_synthetic_fused(cfg, model, state, ckpt, writer,
                             int(jax.device_get(state.step)))
        return

    mesh = make_mesh_for_batch(cfg.batch_size)
    state = replicate(state, mesh)
    step_fn = make_parallel_step(make_interp_train_step(), mesh)

    dataset = _make_dataset(cfg)
    loader = PrefetchLoader(
        triplet_sample_fn(dataset, (cfg.height, cfg.width)),
        len(dataset), cfg.batch_size,
        shard_index=jax.process_index(),
        shard_count=jax.process_count())
    batches = iter(loader)

    writer = MetricWriter(paths["log"])
    key = jax.random.key(cfg.seed + 1)
    t0 = time.time()
    step0 = int(state.step)
    try:
        for i in range(step0, cfg.steps):
            a, b, c = next(batches)
            sub = jax.random.fold_in(key, i)  # resume-stable aug keys
            batch = preprocess_triplet_batch(
                sub, jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                augment=cfg.augment)
            batch = put_batch(batch, mesh)
            state, metrics = step_fn(state, batch)
            if (i + 1) % cfg.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                rate = (cfg.batch_size * (i + 1 - step0)) / (
                    time.time() - t0)
                writer.scalars(i + 1, {**m, "images_per_sec": rate})
                print(f"step {i + 1}: loss={m['loss']:.5f} "
                      f"({rate:.1f} img/s)", file=sys.stderr)
            if (i + 1) % cfg.ckpt_every == 0:
                ckpt.save(i + 1, jax.device_get(state))
    except KeyboardInterrupt:
        print("interrupted; saving", file=sys.stderr)
    if cfg.recalibrate_final:
        from qpwcnet_tpu.train.train_state import recalibrate_batch_stats

        state = jax.device_get(state)  # off the mesh for the plain jit

        def calib_ims():
            for j in range(cfg.recalibrate_final):
                a, b, c = next(batches)
                batch = preprocess_triplet_batch(
                    jax.random.fold_in(key, 1_000_000_000 + j),
                    jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                    augment=False)
                yield batch["ims"]
        state = recalibrate_batch_stats(
            state, calib_ims(), cfg.recalibrate_final)
        print(f"recalibrated BN stats over {cfg.recalibrate_final} "
              f"batches before final save", file=sys.stderr)
    ckpt.save(int(state.step), jax.device_get(state))
    ckpt.wait()
    writer.close()
    loader.close()


if __name__ == "__main__":
    main()
