"""Property/fuzz round trips: random structures, all levels, both codecs."""
import zlib

import numpy as np
import pytest

import deflate_tpu
from deflate_tpu import native as N


def _gen(rng, kind, size):
    if kind == "random":
        return rng.integers(0, 256, size, dtype=np.uint8).tobytes()
    if kind == "lowent":
        return rng.integers(0, 4, size, dtype=np.uint8).tobytes()
    if kind == "runs":
        out = []
        n = 0
        while n < size:
            r = int(rng.integers(1, 400))
            out.append(bytes([int(rng.integers(0, 256))]) * r)
            n += r
        return b"".join(out)[:size]
    if kind == "periodic":
        p = int(rng.integers(1, 300))
        pat = rng.integers(0, 256, p, dtype=np.uint8)
        return np.tile(pat, size // p + 1)[:size].tobytes()
    if kind == "mixed":
        parts = [_gen(rng, k, size // 4)
                 for k in ("random", "lowent", "runs", "periodic")]
        return b"".join(parts)[:size]
    raise AssertionError(kind)


KINDS = ["random", "lowent", "runs", "periodic", "mixed"]


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("seed", [1, 2])
def test_tpu_path_fuzz(kind, seed):
    rng = np.random.default_rng(seed * 100 + KINDS.index(kind))
    size = int(rng.integers(1, 90000))
    data = _gen(rng, kind, size)
    for level in (1, 2):
        enc = deflate_tpu.compress(data, level)
        assert zlib.decompress(enc, -15) == data, (kind, seed, level)
        assert deflate_tpu.decompress(enc) == data


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("seed", [3, 4, 5, 6])
def test_native_path_fuzz(kind, seed):
    if N.lib() is None:
        pytest.skip("no native lib")
    rng = np.random.default_rng(seed * 100 + KINDS.index(kind))
    size = int(rng.integers(1, 400000))
    data = _gen(rng, kind, size)
    for level in (0, 1, 2, 3):
        enc = N.deflate(data, level)
        assert zlib.decompress(enc, -15) == data, (kind, seed, level)
        assert N.inflate(enc, max(1024, len(data))) == data
    # cross: native stream through the device decoder path (CPU backend)
    enc = N.deflate(data, 2)
    assert deflate_tpu.decompress(enc, device=True) == data


def test_truncated_streams_error_not_crash():
    data = b"truncation probe " * 500
    enc = deflate_tpu.compress(data, 2)
    for cut in (1, len(enc) // 2, len(enc) - 1):
        try:
            out = deflate_tpu.decompress(enc[:cut])
            assert out != data          # wrong result must not masquerade
        except (deflate_tpu.InflateError, ValueError):
            pass
