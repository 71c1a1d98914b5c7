"""file_cache decorator (parity with qpwcnet/core/util.py:33-56): cache a
function's JSON-serializable result to disk, keyed by a cache name."""

from __future__ import annotations

import functools
import json
import os
from pathlib import Path

CACHE_DIR = Path(
    os.environ.get("QPWCNET_TPU_CACHE", "~/.cache/qpwcnet_tpu")
).expanduser()


def file_cache(name: str, cache_dir: Path | None = None):
    """Decorator: cache fn() result as JSON at <cache_dir>/<name>.json."""

    def decorator(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            d = Path(cache_dir or CACHE_DIR)
            d.mkdir(parents=True, exist_ok=True)
            path = d / f"{name}.json"
            if path.exists():
                with open(path) as f:
                    return json.load(f)
            result = fn(*args, **kwargs)
            with open(path, "w") as f:
                json.dump(result, f)
            return result

        return wrapped

    return decorator
