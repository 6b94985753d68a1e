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
    """A truncated stream MUST surface as an error — never as silently
    wrong or short output (the reference zero-fills past EOF; we don't)."""
    data = b"truncation probe " * 500
    enc = deflate_tpu.compress(data, 2)
    for cut in (1, len(enc) // 2, len(enc) - 1):
        with pytest.raises((deflate_tpu.InflateError, ValueError)):
            deflate_tpu.decompress(enc[:cut])


def test_truncated_streams_error_device_path():
    data = b"device truncation probe " * 400
    enc = deflate_tpu.compress(data, 2)
    for cut in (len(enc) // 3, len(enc) - 2):
        with pytest.raises((deflate_tpu.InflateError, ValueError)):
            from deflate_tpu.models import decoder as D
            from deflate_tpu.models import host_inflate as HI
            from deflate_tpu.ops import bitpack as BP
            import jax.numpy as jnp
            # call the device decoder directly (no host fallback) so the
            # on-device truncation detection itself is what's under test
            words_np, nbits = BP.bytes_to_words(enc[:cut])
            out, total, _, err = D.decode_stream(
                jnp.asarray(words_np), np.int32(nbits),
                (1 << 18) + 64, 1 << 15, 8)
            if bool(err):
                raise deflate_tpu.InflateError("device decoder flagged error")
            raise AssertionError("device decoder accepted truncated stream")


@pytest.mark.parametrize("seed", [7, 8])
def test_native_garbage_fuzz(seed):
    """Random garbage fed to the native inflate must error cleanly —
    DT_OK on garbage would mean the truncation/validity checks leak."""
    if N.lib() is None:
        pytest.skip("no native lib")
    rng = np.random.default_rng(seed)
    ok = 0
    for _ in range(500):
        n = int(rng.integers(1, 2048))
        garbage = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        try:
            out = N.inflate(garbage, 1 << 16)
            ok += 1                    # rare: garbage can be a valid stream
            # if it "decoded", zlib must agree it is a valid prefix stream
            d = zlib.decompressobj(-15)
            ref = d.decompress(garbage)
            assert out == ref
        except ValueError:
            pass
    assert ok < 50                     # overwhelming majority must error


def test_native_truncated_is_error_not_zero_fill():
    """ADVICE r1: truncated fixed-Huffman streams used to return DT_OK
    with zero-filled garbage; they must error."""
    if N.lib() is None:
        pytest.skip("no native lib")
    data = b"abcdefgh" * 300
    enc = N.deflate(data, 2)
    for cut in range(1, min(len(enc), 40)):
        with pytest.raises(ValueError):
            N.inflate(enc[:-cut], len(data) * 2)


def test_native_empty_input_no_trailing_garbage():
    """ADVICE r1: empty input used to emit two BFINAL blocks."""
    if N.lib() is None:
        pytest.skip("no native lib")
    for level in (0, 1, 2, 3):
        enc = N.deflate(b"", level)
        d = zlib.decompressobj(-15)
        assert d.decompress(enc) == b""
        d.flush()
        assert d.unused_data == b"", (level, enc.hex())
        assert N.inflate(enc, 64) == b""


def test_native_out_size_hard_cap():
    """ADVICE r1: an explicit out_size is a hard cap, not a growth hint."""
    if N.lib() is None:
        pytest.skip("no native lib")
    data = b"x" * 10000
    enc = N.deflate(data, 2)
    with pytest.raises(deflate_tpu.InflateError):
        deflate_tpu.decompress(enc, out_size=100)
    assert deflate_tpu.decompress(enc, out_size=10000) == data
