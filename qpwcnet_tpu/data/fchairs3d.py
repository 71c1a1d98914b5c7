"""FlyingThings3D loader (the reference misnames it "fchairs3d",
qpwcnet/data/fchairs3d.py). Pairs consecutive webp frames from
frames_finalpass_webp/TRAIN/*/*/left with
optical_flow/TRAIN/*/*/into_future/left/OpticalFlowIntoFuture_*_L.pfm
(fchairs3d.py:70-87), with a precomputed set-file listing
(get_dataset_from_set, fchairs3d.py:110-141). PFM/webp decode on host
CPU via numpy/PIL (replacing tf.py_function + tfio.decode_webp).
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

import numpy as np

from qpwcnet_tpu.data.pfm import read_pfm


def fc3d_pairs(root, split: str = "TRAIN"):
    """Yield (prv_webp, nxt_webp, flow_pfm) path triples."""
    root = Path(root)
    img_root = root / "frames_finalpass_webp" / split
    flo_root = root / "optical_flow" / split
    for letter in sorted(p for p in img_root.iterdir() if p.is_dir()):
        for seq in sorted(p for p in letter.iterdir() if p.is_dir()):
            left = seq / "left"
            if not left.is_dir():
                continue
            frames = sorted(left.glob("*.webp"))
            for prv, nxt in zip(frames[:-1], frames[1:]):
                idx = int(prv.stem)
                flo = (flo_root / letter.name / seq.name / "into_future" /
                       "left" / f"OpticalFlowIntoFuture_{idx:04d}_L.pfm")
                if flo.exists():
                    yield str(prv), str(nxt), str(flo)


def write_set_file(root, out_path, split: str = "TRAIN") -> int:
    """Generate the f3d_set.txt listing (fchairs3d.py:182-187 main())."""
    pairs = list(fc3d_pairs(root, split))
    with open(out_path, "w") as f:
        for prv, nxt, flo in pairs:
            f.write(f"{prv}\t{nxt}\t{flo}\n")
    return len(pairs)


def read_set_file(path) -> list[tuple[str, str, str]]:
    out = []
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) == 3:
                out.append(tuple(parts))
    return out


def decode_pair(prv_path, nxt_path, flo_path):
    """-> (ims (H,W,6) uint8, flo (H,W,2) f32). FlyingThings3D PFM flow
    stores 3 channels; the first two are (u, v) (fchairs3d.py:49-53)."""
    from PIL import Image

    a = np.asarray(Image.open(prv_path).convert("RGB"))
    b = np.asarray(Image.open(nxt_path).convert("RGB"))
    flo = read_pfm(flo_path)
    if flo.ndim == 3:
        flo = flo[..., :2]
    return np.concatenate([a, b], -1), np.ascontiguousarray(flo)


def fc3d_iterator(set_file, shuffle: bool = True,
                  seed: int = 0) -> Iterator[tuple]:
    """Yield decoded (ims, flo) pairs from a set file, whole-set shuffled
    (fchairs3d.py:120-129)."""
    pairs = read_set_file(set_file)
    if shuffle:
        rng = np.random.RandomState(seed)
        rng.shuffle(pairs)
    for prv, nxt, flo in pairs:
        yield decode_pair(prv, nxt, flo)
