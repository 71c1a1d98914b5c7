"""Real-data loader throughput (round 5, VERDICT #5 'what's missing').

All end-to-end training evidence so far is on-device synthetic; the
reference feeds its GPU from tf.data AUTOTUNE pipelines
(qpwcnet/data/fchairs3d.py:110-141). This measures whether the repo's
host-side PrefetchLoader (thread-pool PNG decode, data/pipeline.py) can
feed the measured ~105 img/s device train step:

  1. builds a fake Sintel tree (random textures, native 436x1024 PNGs +
     .flo) in /tmp and converts it with data/sintel.py:
     convert_to_tfrecords — exercising the real codec path;
  2. measures PrefetchLoader img/s at several worker counts (host only);
  3. optionally (BENCH_E2E=1, TPU) streams the loader into the jitted
     256x512 bs16 train step and reports end-to-end img/s.

Run: PYTHONPATH=/root/.axon_site:/root/repo python artifacts/bench_loader.py
"""

import os
import sys
import time
from pathlib import Path

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_fake_sintel(root: Path, n_frames: int = 65,
                     hw=(436, 1024)) -> None:
    """One scene of textured frames + smooth flows, Sintel layout."""
    from PIL import Image

    from qpwcnet_tpu.data.flo_format import write_flo

    img_dir = root / "training" / "final" / "alley_x"
    flo_dir = root / "training" / "flow" / "alley_x"
    img_dir.mkdir(parents=True, exist_ok=True)
    flo_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    h, w = hw
    # textured base image (sum of random sinusoids) shifted per frame —
    # PNG-compressible like natural video, not white noise.
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.zeros((h, w, 3), np.float32)
    for _ in range(12):
        fx, fy = rng.uniform(0.005, 0.08, 2)
        ph = rng.uniform(0, 6.28)
        amp = rng.uniform(10, 40, 3)
        base += amp * np.sin(fx * xx + fy * yy + ph)[..., None]
    base = (base - base.min()) / (np.ptp(base) + 1e-6) * 255
    for k in range(n_frames):
        img = np.roll(base, (k * 3) % h, axis=0)
        Image.fromarray(img.astype(np.uint8)).save(
            img_dir / f"frame_{k + 1:04d}.png")
        if k < n_frames - 1:
            flo = np.stack([
                np.full((h, w), 0.0, np.float32),
                np.full((h, w), -3.0, np.float32),
            ], axis=-1)
            write_flo(flo_dir / f"frame_{k + 1:04d}.flo", flo)


def main():
    sys.path.insert(0, "/root/repo")
    from qpwcnet_tpu.data.pipeline import PrefetchLoader
    from qpwcnet_tpu.data.sintel import convert_to_tfrecords
    from qpwcnet_tpu.data.tfrecord import (
        parse_sintel_example,
        tfrecord_iterator,
    )

    root = Path("/tmp/fake_sintel")
    shards_dir = root / "shards"
    if not shards_dir.exists():
        t0 = time.perf_counter()
        make_fake_sintel(root)
        shards = convert_to_tfrecords(
            root, shards_dir, "final", n_shards=8)
        log(f"fake sintel + {len(shards)} shards in "
            f"{time.perf_counter() - t0:.1f}s")
    shards = sorted(shards_dir.glob("*.tfrecord"))

    t0 = time.perf_counter()
    records = [r for s in shards for r in tfrecord_iterator(s)]
    log(f"loaded {len(records)} records (raw bytes) in "
        f"{time.perf_counter() - t0:.1f}s")

    def sample_fn(i: int):
        return parse_sintel_example(records[i])

    bs = 16
    for n_workers in (4, 8, 16):
        loader = PrefetchLoader(
            sample_fn, len(records), batch_size=bs,
            n_workers=n_workers, prefetch=4)
        it = iter(loader)
        # warm up one batch (thread/pool startup)
        next(it)
        n_batches = 12
        t0 = time.perf_counter()
        for _ in range(n_batches):
            next(it)
        dt = time.perf_counter() - t0
        loader.close()
        log(f"PrefetchLoader n_workers={n_workers}: "
            f"{n_batches * bs / dt:.1f} img/s host-only "
            f"(decode 436x1024 PNG pairs)")

    if not os.environ.get("BENCH_E2E"):
        return

    import jax
    import jax.numpy as jnp

    from qpwcnet_tpu.data.pipeline import preprocess_flow_batch
    from qpwcnet_tpu.models import build_flow_net
    from qpwcnet_tpu.train.train_state import (
        create_flow_train_state,
        make_flow_train_step,
    )
    from qpwcnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model, variables = build_flow_net(
        jax.random.key(0), (256, 512), dtype=dtype)
    state = create_flow_train_state(model, variables)
    step = jax.jit(make_flow_train_step())
    key = jax.random.key(1)

    loader = PrefetchLoader(
        sample_fn, len(records), batch_size=bs, n_workers=16, prefetch=4)
    it = iter(loader)

    # compile both programs on the first batch
    ims_u8, flo = next(it)
    key, k = jax.random.split(key)
    batch = preprocess_flow_batch(k, jnp.asarray(ims_u8),
                                  jnp.asarray(flo))
    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    jax.block_until_ready(state.params)
    log(f"train_step compile+first: {time.perf_counter() - t0:.1f}s "
        f"loss={float(metrics['loss']):.4f}")

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        ims_u8, flo = next(it)
        key, k = jax.random.split(key)
        batch = preprocess_flow_batch(k, jnp.asarray(ims_u8),
                                      jnp.asarray(flo))
        state, metrics = step(state, batch)
    float(metrics["loss"])  # host sync
    dt = time.perf_counter() - t0
    loader.close()
    log(f"END-TO-END (loader -> device preprocess+augment -> train step):"
        f" {n_steps * bs / dt:.1f} img/s over {n_steps} steps "
        f"(device-only synthetic rate ~105 img/s, BENCH_r04)")


if __name__ == "__main__":
    main()
