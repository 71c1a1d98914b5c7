"""PFM (portable float map) reader for FlyingThings3D optical flow
(replaces the reference's tf.py_function-wrapped pure-python decode,
qpwcnet/data/fchairs3d.py:13-58) — here it is plain numpy on the host
pipeline, no TF runtime involved."""

from __future__ import annotations

import re

import numpy as np


def read_pfm(path) -> np.ndarray:
    """Read a PFM file -> (H, W) or (H, W, 3) float32, top-down row
    order (PFM stores bottom-up; we flip)."""
    with open(path, "rb") as f:
        header = f.readline().strip()
        if header == b"PF":
            channels = 3
        elif header == b"Pf":
            channels = 1
        else:
            raise ValueError(f"{path}: not a PFM file (header {header!r})")

        dims = f.readline()
        while dims.startswith(b"#"):  # comments
            dims = f.readline()
        m = re.match(rb"^(\d+)\s+(\d+)\s*$", dims)
        if not m:
            raise ValueError(f"{path}: malformed PFM dims {dims!r}")
        w, h = int(m.group(1)), int(m.group(2))

        scale = float(f.readline().strip())
        endian = "<" if scale < 0 else ">"

        data = np.frombuffer(
            f.read(w * h * channels * 4), dtype=f"{endian}f4"
        )
    data = data.reshape(h, w, channels) if channels > 1 else data.reshape(
        h, w
    )
    return np.flipud(data).astype(np.float32).copy()
