"""Triplet-of-frames datasets for frame-interpolation pretraining
(parity with qpwcnet/data/triplet_dataset.py, vimeo_triplet.py,
youtube_vos.py, and the DummyTripletDataset fixture of
triplet_dataset_ops.py:118-150).

Each dataset yields triplets of image FILE PATHS; decoding happens in the
pipeline (qpwcnet_tpu.data.pipeline) on host CPU threads.
"""

from __future__ import annotations

import abc
import tempfile
from pathlib import Path

import numpy as np

from qpwcnet_tpu.utils.cache import file_cache


class TripletDataset(abc.ABC):
    """Random-access triplet-of-filenames interface
    (triplet_dataset.py:9-31)."""

    @abc.abstractmethod
    def keys(self):
        ...

    @abc.abstractmethod
    def __getitem__(self, key):
        """key -> (path_0, path_1, path_2)."""

    @abc.abstractmethod
    def __len__(self):
        ...

    def __iter__(self):
        for k in self.keys():
            yield self[k]


class VimeoTriplet(TripletDataset):
    """vimeo_triplet (toflow.csail.mit.edu): keys from
    tri_{train,test}list.txt; item = sequences/<key>/im{1,2,3}.png
    (vimeo_triplet.py:22-59)."""

    def __init__(self, root, split: str = "train"):
        self.root = Path(root)
        list_file = self.root / f"tri_{split}list.txt"
        with open(list_file) as f:
            self._keys = [ln.strip() for ln in f if ln.strip()]

    def keys(self):
        return list(self._keys)

    def __len__(self):
        return len(self._keys)

    def __getitem__(self, key):
        d = self.root / "sequences" / key
        return (str(d / "im1.png"), str(d / "im2.png"), str(d / "im3.png"))


class YoutubeVos(TripletDataset):
    """YouTube-VOS frames directory scan with JSON-cached per-video frame
    lists and a random equispaced triplet gap d in [1, max_gap+1]
    (youtube_vos.py:45-53,119-142)."""

    def __init__(self, root, split: str = "train", max_gap: int = 8,
                 seed: int = 0, cache_dir=None):
        self.root = Path(root)
        self.max_gap = max_gap
        self._rng = np.random.RandomState(seed)
        frames_dir = self.root / split / "JPEGImages"

        @file_cache(f"ytvos_{split}_index", cache_dir=cache_dir)
        def scan():
            index = {}
            for vid in sorted(frames_dir.iterdir()):
                if vid.is_dir():
                    frames = sorted(str(p) for p in vid.glob("*.jpg"))
                    if len(frames) >= 3:
                        index[vid.name] = frames
            return index

        self._index = scan()
        self._keys = sorted(self._index)

    def keys(self):
        return list(self._keys)

    def __len__(self):
        return len(self._keys)

    def __getitem__(self, key):
        frames = self._index[key]
        n = len(frames)
        d = int(self._rng.randint(1, self.max_gap + 2))
        d = min(d, (n - 1) // 2)
        i0 = int(self._rng.randint(0, n - 2 * d))
        return (frames[i0], frames[i0 + d], frames[i0 + 2 * d])


class DummyTripletDataset(TripletDataset):
    """Synthetic black-image triplet source for exercising the pipeline
    without data (triplet_dataset_ops.py:118-150)."""

    def __init__(self, n: int = 8, hw=(64, 128)):
        from PIL import Image

        self._dir = tempfile.mkdtemp(prefix="qpwcnet_tpu_dummy_")
        img = Image.fromarray(
            np.zeros((hw[0], hw[1], 3), np.uint8)
        )
        self._path = str(Path(self._dir) / "black.png")
        img.save(self._path)
        self._n = n

    def keys(self):
        return list(range(self._n))

    def __len__(self):
        return self._n

    def __getitem__(self, key):
        return (self._path, self._path, self._path)
