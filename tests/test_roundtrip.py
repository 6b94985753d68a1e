"""End-to-end differential tests: our encoder vs python zlib (independent
oracle) and our host decoder, per the reference's three-leg scheme
(test/libdeflate.cpp:100-173) but with hard assertions."""
import zlib

import numpy as np
import pytest

import deflate_tpu


def _corpus():
    rng = np.random.default_rng(0)
    return {
        "empty": b"",
        "one": b"Z",
        "tiny_text": b"hello hello hello world",
        "text": (b"the quick brown fox jumps over the lazy dog. " * 800),
        "runs": b"a" * 70000,
        "random": bytes(rng.integers(0, 256, 40000).astype(np.uint8)),
        "binary_cycle": bytes(np.tile(np.arange(256, dtype=np.uint8), 150)),
    }


CORPUS = _corpus()


@pytest.mark.parametrize("level", [0, 1, 2, 3])
@pytest.mark.parametrize("name", list(CORPUS))
def test_compress_decodes_with_zlib(name, level):
    data = CORPUS[name]
    enc = deflate_tpu.compress(data, level)
    assert zlib.decompress(enc, wbits=-15) == data


@pytest.mark.parametrize("level", [0, 2, 3])
@pytest.mark.parametrize("name", ["text", "random", "runs"])
def test_self_roundtrip(name, level):
    data = CORPUS[name]
    enc = deflate_tpu.compress(data, level)
    assert deflate_tpu.decompress(enc, len(data)) == data


@pytest.mark.parametrize("zlevel", [1, 6, 9])
def test_decompress_zlib_streams(zlevel):
    for name in ("text", "random", "binary_cycle"):
        data = CORPUS[name]
        ref = zlib.compress(data, zlevel)[2:-4]     # raw deflate
        assert deflate_tpu.decompress(ref, len(data)) == data


def test_zlib_container_roundtrip():
    data = CORPUS["text"]
    wrapped = deflate_tpu.compress_zlib(data, 2)
    # their decoder accepts our container
    assert zlib.decompress(wrapped) == data
    # our decoder accepts their container (with checksum verification)
    assert deflate_tpu.decompress_zlib(zlib.compress(data, 6)) == data
    # corrupted checksum is detected
    bad = wrapped[:-1] + bytes([wrapped[-1] ^ 1])
    with pytest.raises(deflate_tpu.InflateError):
        deflate_tpu.decompress_zlib(bad)


def test_multiblock_boundaries():
    # sizes around the 32 KiB block boundary (quirk Q1)
    rng = np.random.default_rng(5)
    base = bytes(rng.integers(0, 200, 70000).astype(np.uint8))
    for size in (32767, 32768, 32769, 65536, 65537):
        data = base[:size]
        enc = deflate_tpu.compress(data, 2)
        assert zlib.decompress(enc, wbits=-15) == data


def test_reference_corpus_zlib_containers():
    """weird.dat / zlib.dat are zlib streams (SURVEY.md §2.5)."""
    import zlib as Z
    for name in ("weird.dat", "zlib.dat"):
        raw = open(f"/root/reference/{name}", "rb").read()
        ours = deflate_tpu.decompress_zlib(raw)
        theirs = Z.decompress(raw)
        assert ours == theirs


def test_incompressible_goes_stored():
    data = CORPUS["random"]
    enc = deflate_tpu.compress(data, 3)
    # 2 blocks -> at most 5 bytes overhead each + container slack
    assert len(enc) <= len(data) + 12


def test_level_validation():
    with pytest.raises(ValueError):
        deflate_tpu.compress(b"x", 4)
    with pytest.raises(ValueError):
        deflate_tpu.compress(b"x", -1)
