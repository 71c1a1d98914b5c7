"""Run-directory management (parity with app/optical_flow/train.py:161-184:
auto-incrementing /tmp/pwc/run/NNN with log/ and ckpt/ subdirs, plus the
config snapshot of train.py:553-558 / pre_train.py:262-263)."""

from __future__ import annotations

import json
from dataclasses import asdict, is_dataclass
from pathlib import Path


def setup_run_dir(root="/tmp/qpwcnet_tpu/run") -> dict:
    """Create the next run dir root/NNN with log/ and ckpt/ subdirs."""
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    existing = [
        int(p.name) for p in root.iterdir()
        if p.is_dir() and p.name.isdigit()
    ]
    run_id = max(existing, default=-1) + 1
    run_dir = root / f"{run_id:03d}"
    paths = {
        "run": run_dir,
        "log": run_dir / "log",
        "ckpt": run_dir / "ckpt",
    }
    for p in paths.values():
        p.mkdir(parents=True, exist_ok=True)
    return paths


def snapshot_config(run_dir, config) -> None:
    """Dump the config to <run>/config.json (pre_train.py:262-263)."""
    if is_dataclass(config) and not isinstance(config, type):
        config = asdict(config)
    with open(Path(run_dir) / "config.json", "w") as f:
        json.dump(config, f, indent=2, default=str)
