"""gzip container + batched multi-stream API."""
import gzip as _gzip
import zlib

import numpy as np
import pytest

import deflate_tpu


CASES = {
    "text": b"the gzip container test " * 400,
    "random": bytes(np.random.default_rng(0).integers(0, 256, 50000,
                                                      dtype=np.uint8)),
    "empty": b"",
}


@pytest.mark.parametrize("name", CASES)
def test_gzip_roundtrip_and_stdlib_interop(name):
    data = CASES[name]
    g = deflate_tpu.compress_gzip(data, 2)
    assert _gzip.decompress(g) == data            # stdlib reads ours
    assert deflate_tpu.decompress_gzip(g) == data
    theirs = _gzip.compress(data, 6)
    assert deflate_tpu.decompress_gzip(theirs) == data  # we read stdlib's


def test_gzip_crc_detected():
    g = bytearray(deflate_tpu.compress_gzip(b"hello world" * 100, 2))
    g[-6] ^= 0xFF                                 # corrupt CRC
    with pytest.raises(deflate_tpu.InflateError):
        deflate_tpu.decompress_gzip(bytes(g))


def test_compress_many_matches_singles():
    rng = np.random.default_rng(3)
    bufs = [
        b"stream zero " * 300,
        bytes(rng.integers(0, 256, 70000, dtype=np.uint8)),    # 3 blocks
        b"x",
        bytes(rng.integers(97, 123, 40000, dtype=np.uint8)),   # 2 blocks
    ]
    outs = deflate_tpu.compress_many(bufs, 2)
    assert len(outs) == len(bufs)
    for buf, enc in zip(bufs, outs):
        assert zlib.decompress(enc, -15) == buf
    # batched output must equal the single-stream encoder's
    for buf, enc in zip(bufs, outs):
        assert enc == deflate_tpu.compress(buf, 2)
    assert deflate_tpu.decompress_many(outs) == bufs
