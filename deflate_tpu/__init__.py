"""deflate_tpu — a TPU-native DEFLATE (RFC 1951) codec built on JAX.

Public API mirrors the reference library's surface (deflate.hpp:753-815,
inflate.hpp:324-408) with a correctness upgrade: every level round-trips
bit-exactly (the reference's level 2 emits corrupt streams — SURVEY.md B1).

    compress(data, level=2) -> bytes          # raw DEFLATE
    compress_file(src, dst, level=2)
    decompress(data, out_size=None) -> bytes  # raw DEFLATE
    decompress_zlib(data) -> bytes            # RFC 1950 container
    decompress_file(src, dst)

Levels: 0 stored, 1 Huffman-only, 2 fast (hash-chain), 3 best (lazy).
"""
from __future__ import annotations

import numpy as np

from deflate_tpu.models import host_inflate as _hi
from deflate_tpu.runtime import stitch as _stitch
from deflate_tpu.utils.tables import BLOCK_SIZE

InflateError = _hi.InflateError

__all__ = ["compress", "compress_file", "decompress", "decompress_zlib",
           "decompress_file", "compress_zlib", "InflateError"]

_BATCH_BUCKETS = (1, 8, 64)


def _as_u8(data) -> np.ndarray:
    if isinstance(data, (bytes, bytearray, memoryview)):
        return np.frombuffer(bytes(data), dtype=np.uint8)
    a = np.asarray(data)
    if a.dtype != np.uint8:
        raise TypeError(f"expected bytes or uint8 array, got {a.dtype}")
    return a.reshape(-1)


def _bucket(n: int) -> int:
    for b in _BATCH_BUCKETS:
        if n <= b:
            return b
    return _BATCH_BUCKETS[-1]


def compress(data, level: int = 2, backend: str = "tpu") -> bytes:
    """Compress to a raw DEFLATE stream (decodable by zlib wbits=-15).

    backend: "tpu" (the JAX/device encoder — default), "native" (the C++
    host runtime, deflate_tpu/native/deflate.cpp), or "auto" (native for
    sub-block inputs where a device round trip costs more than the work).
    """
    if not 0 <= level <= 3:
        raise ValueError(f"level must be 0..3, got {level}")
    if backend not in ("tpu", "native", "auto"):
        raise ValueError(f"unknown backend {backend!r}")
    buf = _as_u8(data)
    if backend == "native" or (backend == "auto" and len(buf) < BLOCK_SIZE):
        from deflate_tpu import native as _nat

        out = _nat.deflate(buf.tobytes(), level)
        if out is not None:
            return out

    import jax.numpy as jnp

    from deflate_tpu.models import encoder as E
    nblocks = max(1, -(-len(buf) // BLOCK_SIZE))
    segments = []
    done = 0
    phase = 0                  # stream bit phase at the segment boundary
    while done < nblocks:
        B = _bucket(nblocks - done)
        take = min(B, nblocks - done)
        blocks = np.zeros((B, BLOCK_SIZE), np.uint8)
        blens = np.zeros((B,), np.int32)
        for i in range(take):
            chunk = buf[(done + i) * BLOCK_SIZE:(done + i + 1) * BLOCK_SIZE]
            blocks[i, :len(chunk)] = chunk
            blens[i] = len(chunk)
        live = np.arange(B) < take
        final_idx = (take - 1) if done + take == nblocks else -1
        words, total = E.encode_batch(
            jnp.asarray(blocks), jnp.asarray(blens), jnp.asarray(live),
            jnp.int32(final_idx), level, jnp.int32(phase))
        segments.append((np.asarray(words), int(total)))
        phase = (phase + int(total)) & 7
        done += take
    out_words, out_bits = _stitch.stitch_segments(segments)
    return _stitch.words_to_bytes(out_words, out_bits)


def decompress(data, out_size: int | None = None,
               device: bool = False) -> bytes:
    """Decompress a raw DEFLATE stream.

    device=True runs the massively-parallel TPU decoder
    (models/decoder.py) with automatic host fallback on any stream it
    cannot represent; device=False uses the host decoder.
    """
    if device:
        from deflate_tpu.models import decoder as _dd

        return _dd.inflate_device(bytes(data), out_size)
    from deflate_tpu import native as _nat

    raw = bytes(data)
    try:
        out = _nat.inflate(raw, out_size or max(1024, 8 * len(raw)))
    except ValueError as e:
        raise InflateError(str(e)) from None
    if out is not None:
        return out
    return _hi.inflate_raw(raw, out_size)


def decompress_zlib(data, device: bool = False) -> bytes:
    """Decompress a zlib-wrapped (RFC 1950) stream, verifying Adler-32."""
    data = bytes(data)
    if device:
        if len(data) < 6:
            raise InflateError("zlib stream too short")
        cmf, flg = data[0], data[1]
        if cmf & 0x0F != 8:
            raise InflateError("unsupported compression method")
        if (cmf * 256 + flg) % 31 != 0:
            raise InflateError("bad zlib header check")
        ofs = 6 if flg & 0x20 else 2
        out = decompress(data[ofs:], device=True)
        if _hi.adler32(out) != int.from_bytes(data[-4:], "big"):
            raise InflateError("adler32 mismatch")
        return out
    return _hi.inflate_zlib(data)


def compress_zlib(data, level: int = 2) -> bytes:
    """Compress into a zlib (RFC 1950) container — the reference can only
    *read* zlib streams; we also write them."""
    raw = compress(data, level)
    hdr = bytes([0x78, 0x01])            # CM=8, CINFO=7, FCHECK -> 0x7801
    adler = _hi.adler32(bytes(data) if not isinstance(data, bytes) else data)
    return hdr + raw + adler.to_bytes(4, "big")


def compress_file(src: str, dst: str, level: int = 2) -> None:
    with open(src, "rb") as f:
        data = f.read()
    out = compress(data, level)
    with open(dst, "wb") as f:
        f.write(out)


def decompress_file(src: str, dst: str) -> None:
    with open(src, "rb") as f:
        data = f.read()
    out = decompress(data)
    with open(dst, "wb") as f:
        f.write(out)
