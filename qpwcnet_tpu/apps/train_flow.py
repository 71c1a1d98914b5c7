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

    data: str = "synthetic"  # 'synthetic' | 'fc3d' | 'sintel'
    data_path: str = ""      # fc3d set file / sintel shard glob
    batch_size: int = 16
    learning_rate: float = 1e-4
    steps: int = 100_000
    height: int = 256
    width: int = 512
    base_scale: float = 1.0   # 0.56 for FlyingThings3D (train.py:147)
    augment: bool = True
    log_every: int = 100
    ckpt_every: int = 2000
    run_root: str = "/tmp/qpwcnet_tpu/run"
    load_ckpt: str = ""       # run dir to resume / transfer from
    transfer_from_interp: bool = False
    compute_dtype: str = "float32"  # or 'bfloat16'
    seed: int = 0


def _synthetic_batches(cfg: Settings):
    """Learnable synthetic pairs: smooth random textures displaced by a
    known integer flow (nxt[p] shifted so prv[p] == nxt[p + flow]), for
    end-to-end training validation without datasets."""
    rng = np.random.RandomState(cfg.seed)
    h, w = cfg.height, cfg.width
    while True:
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
    model, variables = build_flow_net(
        jax.random.key(cfg.seed), (cfg.height, cfg.width), dtype=dtype
    )
    state = create_flow_train_state(
        model, variables, learning_rate=cfg.learning_rate)

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

    mesh = make_mesh_for_batch(cfg.batch_size)
    state = replicate(state, mesh)
    step_fn = make_parallel_step(make_flow_train_step(), mesh)

    writer = MetricWriter(paths["log"])
    if cfg.data == "synthetic":
        from qpwcnet_tpu.data.pipeline import prefetch_iterator

        batches = prefetch_iterator(_synthetic_batches(cfg))
    else:
        batches = _dataset_batches(cfg)

    key = jax.random.key(cfg.seed + 1)
    t0 = time.time()
    step0 = int(state.step)
    try:
        for i in range(step0, cfg.steps):
            ims_u8, flo = next(batches)
            key, sub = jax.random.split(key)
            batch = preprocess_flow_batch(
                sub, jnp.asarray(ims_u8), jnp.asarray(flo),
                out_hw=(cfg.height, cfg.width),
                base_scale=cfg.base_scale, augment=cfg.augment)
            batch = put_batch(batch, mesh)
            state, metrics = step_fn(state, batch)
            if (i + 1) % cfg.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                rate = (cfg.batch_size * (i + 1 - step0)) / (
                    time.time() - t0)
                writer.scalars(i + 1, {**m, "images_per_sec": rate})
                print(f"step {i + 1}: loss={m['loss']:.4f} "
                      f"epe={m['epe']:.3f} ({rate:.1f} img/s)",
                      file=sys.stderr)
            if (i + 1) % cfg.ckpt_every == 0:
                ckpt.save(i + 1, jax.device_get(state))
    except KeyboardInterrupt:
        # save-on-interrupt (train.py:377-389)
        print("interrupted; saving", file=sys.stderr)
    ckpt.save(int(state.step), jax.device_get(state))
    ckpt.wait()
    writer.close()


if __name__ == "__main__":
    main()
