"""Visualization helpers (parity with qpwcnet/vis/show.py — an OpenCV
imshow wrapper). Headless-first: tiles arrays into one canvas and saves a
PNG; falls back to cv2.imshow only when a display is requested and
available.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _to_u8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None].repeat(3, -1)
    if img.dtype != np.uint8:
        img = np.clip(img, 0.0, 1.0)
        img = (img * 255.0).astype(np.uint8)
    return img


def tile_images(images: dict[str, np.ndarray],
                cols: int = 3) -> np.ndarray:
    """Tile named images (varied sizes allowed) into one uint8 canvas."""
    items = [(k, _to_u8(v)) for k, v in images.items()]
    h = max(v.shape[0] for _, v in items)
    w = max(v.shape[1] for _, v in items)
    rows = (len(items) + cols - 1) // cols
    canvas = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, (_, img) in enumerate(items):
        r, c = divmod(i, cols)
        canvas[r * h:r * h + img.shape[0],
               c * w:c * w + img.shape[1]] = img
    return canvas


def show(images: dict[str, np.ndarray], out_path=None,
         window: str | None = None, wait_ms: int = 0) -> np.ndarray:
    """Save a tiled canvas to out_path (default /tmp) and optionally show
    it in a cv2 window (the reference's vis/show.py:9-27 role)."""
    canvas = tile_images(images)
    if out_path is None:
        out_path = "/tmp/qpwcnet_tpu_show.png"
    from PIL import Image

    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(canvas).save(out_path)
    if window is not None:
        try:
            import cv2

            cv2.imshow(window, canvas[..., ::-1])
            cv2.waitKey(wait_ms)
        except Exception:
            pass
    return canvas
