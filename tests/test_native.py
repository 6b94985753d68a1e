"""Native (C++) host runtime vs zlib and the JAX path."""
import zlib

import numpy as np
import pytest

import deflate_tpu
from deflate_tpu import native as N

pytestmark = pytest.mark.skipif(N.lib() is None,
                                reason="native toolchain unavailable")

CASES = {
    "text": bytes(np.random.default_rng(0).integers(97, 117, 90000,
                                                    dtype=np.uint8)),
    "repeat": b"hello world! " * 7000,
    "random": bytes(np.random.default_rng(1).integers(0, 256, 70000,
                                                      dtype=np.uint8)),
    "runs": b"a" * 120000,
    "empty": b"",
    "one": b"Q",
}


@pytest.mark.parametrize("name", CASES)
@pytest.mark.parametrize("zlevel", [0, 1, 6, 9])
def test_inflate_foreign(name, zlevel):
    data = CASES[name]
    raw = zlib.compress(data, zlevel)[2:-4]
    assert N.inflate(raw, max(1024, len(data))) == data


@pytest.mark.parametrize("name", CASES)
@pytest.mark.parametrize("level", [0, 1, 2, 3])
def test_deflate_roundtrip(name, level):
    data = CASES[name]
    enc = N.deflate(data, level)
    assert zlib.decompress(enc, -15) == data
    assert N.inflate(enc, max(1024, len(data))) == data


def test_beats_reference_sizes():
    tb = open("/root/reference/test.bmp", "rb").read()
    assert len(N.deflate(tb, 3)) <= 3124          # reference L3
    tiny = open("/root/reference/tiny.bmp", "rb").read()
    assert len(N.deflate(tiny, 3)) <= 67


def test_adler32_matches_zlib():
    for data in CASES.values():
        assert N.adler32(data) == zlib.adler32(data)


def test_corrupt_stream_raises():
    raw = bytearray(zlib.compress(CASES["text"], 9)[2:-4])
    raw[10] ^= 0x55
    with pytest.raises(ValueError):
        out = N.inflate(bytes(raw), len(CASES["text"]) * 2)
        assert out != CASES["text"]


def test_public_api_backends():
    data = b"backend test " * 500
    for backend in ("native", "auto"):
        enc = deflate_tpu.compress(data, 2, backend=backend)
        assert zlib.decompress(enc, -15) == data
    assert deflate_tpu.decompress(zlib.compress(data, 9)[2:-4]) == data
