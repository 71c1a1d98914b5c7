"""Native host-IO library tests: C++ crc32c/tfrecord framing vs the
pure-python reference implementation."""

import numpy as np
import pytest

from qpwcnet_tpu import native


def _lib_or_skip():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_native_crc32c_vectors():
    _lib_or_skip()
    assert native.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert native.crc32c(b"123456789") == 0xE3069283


def test_native_matches_python():
    _lib_or_skip()
    import importlib

    import qpwcnet_tpu.data.tfrecord as tfr

    rng = np.random.RandomState(0)
    for n in (0, 1, 7, 8, 63, 1024, 10_000):
        data = rng.randint(0, 256, n, np.uint8).tobytes()
        # python path (bypass native preference)
        table = tfr._crc_table().tolist()
        crc = 0xFFFFFFFF
        for b in data:
            crc = (crc >> 8) ^ table[(crc ^ b) & 0xFF]
        crc ^= 0xFFFFFFFF
        assert native.crc32c(data) == crc, n


def test_native_frame_scan_roundtrip():
    _lib_or_skip()
    payloads = [b"hello", b"", b"x" * 1000]
    buf = b"".join(native.tfrecord_frame(p) for p in payloads)
    spans = native.tfrecord_scan(buf, verify=True)
    got = [buf[o:o + n] for o, n in spans]
    assert got == payloads


def test_native_scan_detects_corruption():
    _lib_or_skip()
    buf = bytearray(native.tfrecord_frame(b"payload"))
    buf[14] ^= 0xFF  # flip a payload byte
    with pytest.raises(ValueError):
        native.tfrecord_scan(bytes(buf), verify=True)


def test_tfrecord_write_read_uses_native(tmp_path):
    _lib_or_skip()
    from qpwcnet_tpu.data.tfrecord import tfrecord_iterator, write_tfrecord

    recs = [b"a" * 10, b"b" * 100]
    p = tmp_path / "n.tfrecord"
    assert write_tfrecord(p, recs) == 2
    assert list(tfrecord_iterator(p, verify_crc=True)) == recs
