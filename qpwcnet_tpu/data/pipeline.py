"""Input pipeline: host-side threaded decode/batch + device-side
preprocessing (replaces the reference's tf.data pipelines,
app/optical_flow/train.py:125-158 and triplet_dataset_ops.py:57-90).

Division of labor (TPU-first):
  * host CPU threads: file IO + PNG/webp/PFM/flo decode + batching
    (:class:`PrefetchLoader`);
  * TPU (jitted): normalization, flow-aware augmentation
    (qpwcnet_tpu.data.augment), NaN scrub — fused with the train step's
    first ops by XLA.

The NaN scrub mirrors train.py:91-92 (FlyingThings3D contains NaNs).
"""

from __future__ import annotations

import functools
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qpwcnet_tpu.data.augment import (
    augment_triplet_batch,
    image_augment_batch,
)
from qpwcnet_tpu.ops.resize import resize_bilinear


# ------------------------------------------------------------------ host

class PrefetchLoader:
    """Background-thread batch producer.

    sample_fn(index) -> tuple of numpy arrays; batches are stacked along
    axis 0 and pushed into a bounded queue (the tf.data
    shuffle/batch/prefetch equivalent, triplet_dataset_ops.py:57-90).
    """

    def __init__(
        self,
        sample_fn: Callable[[int], Tuple[np.ndarray, ...]],
        n_samples: int,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = True,
        n_workers: int = 4,
        prefetch: int = 2,
        repeat: bool = True,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        """shard_index/shard_count: multi-host data sharding — every
        process shuffles the SAME order (same seed) and keeps the
        disjoint slice ``order[shard_index::shard_count]``, so the union
        over processes covers each epoch exactly once with no duplicate
        samples across hosts. Pass jax.process_index()/process_count()
        (the tf.data shard() role; single-process defaults are the
        identity)."""
        if not (0 <= shard_index < shard_count):
            raise ValueError(f"bad shard {shard_index}/{shard_count}")
        self.sample_fn = sample_fn
        self.n_samples = n_samples
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.n_workers = n_workers
        self.prefetch = prefetch
        self.repeat = repeat
        self.shard_index = shard_index
        self.shard_count = shard_count
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _produce(self):
        rng = np.random.RandomState(self.seed)
        epoch = 0
        with ThreadPoolExecutor(self.n_workers) as pool:
            while not self._stop.is_set():
                order = np.arange(self.n_samples)
                if self.shuffle:
                    rng.shuffle(order)
                order = order[self.shard_index::self.shard_count]
                for i in range(0, len(order), self.batch_size):
                    idx = order[i:i + self.batch_size]
                    if self.drop_remainder and len(idx) < self.batch_size:
                        break
                    samples = list(pool.map(self.sample_fn, idx.tolist()))
                    batch = tuple(
                        np.stack([s[k] for s in samples])
                        for k in range(len(samples[0]))
                    )
                    while not self._stop.is_set():
                        try:
                            self._q.put(batch, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
                epoch += 1
                if not self.repeat:
                    self._q.put(None)
                    return

    def __iter__(self) -> Iterator[Tuple[np.ndarray, ...]]:
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._produce, daemon=True
            )
            self._thread.start()
        while True:
            batch = self._q.get()
            if batch is None:
                return
            yield batch

    def close(self):
        self._stop.set()


def prefetch_iterator(it: Iterable, depth: int = 2) -> Iterator:
    """Run an iterator in a background thread with a bounded queue so
    host-side batch production overlaps device compute (used by the
    synthetic training modes; PrefetchLoader covers file datasets)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()

    def worker():
        try:
            for item in it:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        finally:
            q.put(_END)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            yield item
    finally:
        stop.set()


# ---------------------------------------------------------------- device

def _nan_scrub(x):
    return jnp.where(jnp.isnan(x), jnp.zeros_like(x), x)


def _resize_pair(ims, flo, out_hw):
    """No-aug resize with per-axis flow rescale (augment.py:145-153)."""
    h, w = ims.shape[1], ims.shape[2]
    oh, ow = out_hw
    ims_r = resize_bilinear(ims, out_hw)
    flo_r = resize_bilinear(flo, out_hw)
    flo_r = flo_r * jnp.asarray([ow / w, oh / h], flo_r.dtype)
    return ims_r, flo_r


@functools.partial(
    jax.jit, static_argnames=("out_hw", "base_scale", "augment")
)
def preprocess_flow_batch(
    key,
    ims_u8,
    flo,
    out_hw: Tuple[int, int] = (256, 512),
    base_scale: float = 1.0,
    augment: bool = True,
):
    """uint8 (B,H,W,6) + flow (B,H,W,2) -> {'ims': f32 [-0.5, 0.5] at
    out_hw, 'flo': f32} (the preprocess of train.py:71-94: /255,
    augment-or-resize, -0.5, NaN scrub)."""
    ims = ims_u8.astype(jnp.float32) * (1.0 / 255.0)
    flo = flo.astype(jnp.float32)
    if augment:
        ims, flo = image_augment_batch(key, ims, flo, out_hw, base_scale)
    else:
        ims, flo = _resize_pair(ims, flo, out_hw)
    ims = ims - 0.5
    return {"ims": _nan_scrub(ims), "flo": _nan_scrub(flo)}


@functools.partial(jax.jit, static_argnames=("augment",))
def preprocess_triplet_batch(key, a_u8, b_u8, c_u8, augment: bool = True):
    """uint8 triplet (B,H,W,3)x3 -> {'ims': concat[frame0, frame2] - 0.5,
    'mid': frame1 - 0.5} (pre_train.py:110-124), with the batched
    triplet-consistent augmentation of triplet_dataset_ops.py:20-54."""
    a = a_u8.astype(jnp.float32) * (1.0 / 255.0)
    b = b_u8.astype(jnp.float32) * (1.0 / 255.0)
    c = c_u8.astype(jnp.float32) * (1.0 / 255.0)
    if augment:
        a, b, c = augment_triplet_batch(key, a, b, c)
    ims = jnp.concatenate([a, c], axis=-1) - 0.5
    mid = b - 0.5
    return {"ims": ims, "mid": mid}


# ------------------------------------------------------------ assemblers

def flow_sample_fn(pairs: Sequence, decode: Callable):
    """Wrap a list of path tuples + decoder into a sample_fn."""

    def fn(i: int):
        return decode(*pairs[i])

    return fn


def load_image(path, size_hw=None) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if size_hw is not None:
        img = img.resize((size_hw[1], size_hw[0]), Image.BILINEAR)
    return np.asarray(img)


def triplet_sample_fn(dataset, size_hw=None):
    """TripletDataset -> sample_fn yielding three (H,W,3) uint8 frames
    (read_and_resize, triplet_dataset_ops.py:12-18)."""
    keys = dataset.keys()

    def fn(i: int):
        p0, p1, p2 = dataset[keys[i]]
        return (
            load_image(p0, size_hw),
            load_image(p1, size_hw),
            load_image(p2, size_hw),
        )

    return fn
