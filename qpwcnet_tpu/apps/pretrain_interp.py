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

    data: str = "dummy"        # 'vimeo' | 'ytvos' | 'dummy'
    data_path: str = ""
    batch_size: int = 8
    learning_rate: float = 1e-4
    steps: int = 100_000
    height: int = 256
    width: int = 512
    augment: bool = True
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


def _make_dataset(cfg: Settings):
    from qpwcnet_tpu.data.triplet import (
        DummyTripletDataset, VimeoTriplet, YoutubeVos)

    if cfg.data == "vimeo":
        return VimeoTriplet(cfg.data_path, "train")
    if cfg.data == "ytvos":
        return YoutubeVos(cfg.data_path, "train")
    return DummyTripletDataset(n=max(cfg.batch_size * 4, 32),
                               hw=(cfg.height, cfg.width))


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
        quant=quant)
    state = create_interp_train_state(
        model, variables, learning_rate=cfg.learning_rate)

    ckpt = CheckpointManager(paths["ckpt"])
    if cfg.load_ckpt:
        src = CheckpointManager(cfg.load_ckpt)
        state = src.restore(state)
        src.close()
    else:
        state = ckpt.restore(state)

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
    ckpt.save(int(state.step), jax.device_get(state))
    ckpt.wait()
    writer.close()
    loader.close()


if __name__ == "__main__":
    main()
