"""Native host-IO library loader (ctypes).

Builds qpwcnet_tpu/native/csrc/tfrecord_io.cpp with g++ on first use
(cached as libqpwc_native.so next to the source) and exposes:

  * crc32c(data) / masked_crc32c(data)
  * tfrecord_frame(payload) -> framed record bytes
  * tfrecord_scan(buffer, verify) -> list[(offset, length)]

Falls back to None when no toolchain is available; callers keep their
pure-python paths (qpwcnet_tpu/data/tfrecord.py).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

_HERE = Path(__file__).parent
_SRC = _HERE / "csrc" / "tfrecord_io.cpp"
_LIB = _HERE / "libqpwc_native.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", str(_LIB), str(_SRC)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Return the loaded ctypes library, building if needed; None if
    unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB.exists() or (_SRC.stat().st_mtime
                                 > _LIB.stat().st_mtime):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
        lib.qpwc_crc32c.restype = ctypes.c_uint32
        lib.qpwc_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.qpwc_masked_crc32c.restype = ctypes.c_uint32
        lib.qpwc_masked_crc32c.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64]
        lib.qpwc_tfrecord_frame.restype = ctypes.c_uint64
        lib.qpwc_tfrecord_frame.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_void_p]
        lib.qpwc_tfrecord_scan.restype = ctypes.c_int64
        lib.qpwc_tfrecord_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_void_p,
            ctypes.c_uint64, ctypes.c_int]
        _lib = lib
        return _lib


def crc32c(data: bytes) -> int | None:
    lib = get_lib()
    if lib is None:
        return None
    return int(lib.qpwc_crc32c(data, len(data)))


def masked_crc32c(data: bytes) -> int | None:
    lib = get_lib()
    if lib is None:
        return None
    return int(lib.qpwc_masked_crc32c(data, len(data)))


def tfrecord_frame(payload: bytes) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(len(payload) + 16)
    n = lib.qpwc_tfrecord_frame(payload, len(payload), out)
    return out.raw[:n]


def tfrecord_scan(buf: bytes, verify: bool = False):
    lib = get_lib()
    if lib is None:
        return None
    max_records = max(16, len(buf) // 32)
    spans = (ctypes.c_uint64 * (2 * max_records))()
    n = lib.qpwc_tfrecord_scan(buf, len(buf), spans, max_records,
                               1 if verify else 0)
    if n < 0:
        raise ValueError("TFRecord CRC mismatch")
    n = min(int(n), max_records)
    return [(int(spans[2 * i]), int(spans[2 * i + 1])) for i in range(n)]
