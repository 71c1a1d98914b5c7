"""Metrics / observability (SURVEY.md §5): TensorBoard scalars + the
reference's multiscale flow-RGB image summaries
(app/optical_flow/train.py:187-244 ShowImageCallback, train.py:483-494).

Backed by tensorboardX (no TF dependency needed at runtime, though TF is
present); degrades to a JSONL logger when tensorboardX is unavailable.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

from qpwcnet_tpu.ops.flow_vis import flow_to_image


class MetricWriter:
    """Scalar + image summaries. Scalars are also mirrored to a JSONL
    file in the run dir for offline analysis."""

    def __init__(self, log_dir):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(str(self.log_dir))
        except Exception:
            self._tb = None

    def scalars(self, step: int, values: dict) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in values.items():
            v = float(v)
            rec[k] = v
            if self._tb is not None:
                self._tb.add_scalar(k, v, int(step))
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def flow_image(self, step: int, tag: str, flow) -> None:
        """Render an (H, W, 2) or (B, H, W, 2) flow to RGB and log it
        (the flow_to_image rendering of the reference callbacks)."""
        flow = np.asarray(flow)
        if flow.ndim == 4:
            flow = flow[0]
        rgb = np.asarray(flow_to_image(flow))
        if self._tb is not None:
            self._tb.add_image(tag, rgb, int(step), dataformats="HWC")

    def image(self, step: int, tag: str, img) -> None:
        img = np.asarray(img)
        if img.ndim == 4:
            img = img[0]
        img = np.clip(img, 0.0, 1.0)
        if self._tb is not None:
            self._tb.add_image(tag, img, int(step), dataformats="HWC")

    def flush(self):
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
