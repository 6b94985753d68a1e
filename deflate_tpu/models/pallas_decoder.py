"""Device inflate via the Pallas scalar-core kernel (ops/pallas_inflate).

Two entry points:

- ``inflate_manifest(stream, manifest)``: decode ALL blocks of a
  manifest-indexed stream in one batched kernel launch (the production
  path for this package's own output, whose blocks are self-contained —
  reference quirk Q5, deflate.hpp:697).  Block count is bucketed to
  powers of two to bound the number of compiled grid shapes.

- ``inflate_stream(stream)``: decode an arbitrary self-contained raw
  DEFLATE stream without a manifest by chaining blocks through the
  kernel-reported end bit.  Each block costs a device round trip
  (~26 ms on the dev tunnel), so this is a correctness/fallback path,
  not a throughput path.

Both raise ``PallasDecodeError`` when the kernel flags a block (corrupt
stream, or a foreign stream with cross-block back-references, which the
per-block window cannot represent); callers fall back to the host
runtime.

Reference analog: inflate.hpp:277-322 (realDecompress block loop).
"""
from __future__ import annotations

import numpy as np


class PallasDecodeError(Exception):
    pass


def _bucket_pow2(n: int, lo: int = 4, hi: int = 256) -> int:
    b = lo
    while b < n and b < hi:
        b *= 2
    return b


def available() -> bool:
    """True when a TPU backend is present (the kernel needs a real chip
    or interpret mode)."""
    try:
        import jax

        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def inflate_manifest(stream: bytes, blocks, interpret: bool = False,
                     batch: int = 256) -> bytes:
    """Decode manifest-indexed blocks.  ``blocks`` is an iterable of
    (bit_offset, bit_len, out_len) triples (runtime/manifest.py format).

    Returns the concatenated output; raises PallasDecodeError if any
    block errs."""
    from deflate_tpu.ops import pallas_inflate as PI

    blocks = list(blocks)
    if not blocks:
        return b""
    offs = np.asarray([b[0] for b in blocks], np.int64)
    out_lens = np.asarray([b[2] for b in blocks], np.int64)
    parts = []
    for s in range(0, len(blocks), batch):
        sl = slice(s, min(s + batch, len(blocks)))
        o, produced, err, _ = PI.inflate_blocks(
            stream, offs[sl], interpret=interpret)
        want = out_lens[sl]
        if np.any(err != 0) or np.any(produced != want):
            bad = int(np.argmax((err != 0) | (produced != want)))
            raise PallasDecodeError(
                f"block {s + bad}: err={int(err[bad])} "
                f"produced={int(produced[bad])} want={int(want[bad])}")
        for i in range(o.shape[0]):
            parts.append(o[i, :want[i]].tobytes())
    return b"".join(parts)


def inflate_stream(stream: bytes, interpret: bool = False,
                   max_blocks: int = 1 << 20) -> bytes:
    """Decode a raw DEFLATE stream of self-contained blocks by chaining
    kernel calls; the host reads only each block's BFINAL bit."""
    from deflate_tpu.ops import pallas_inflate as PI

    if not stream:
        raise PallasDecodeError("empty stream")
    out = bytearray()
    offs = 0
    nbits = len(stream) * 8
    for _ in range(max_blocks):
        if offs >= nbits:
            raise PallasDecodeError("stream ends before BFINAL block")
        bfinal = (stream[offs >> 3] >> (offs & 7)) & 1
        o, produced, err, end_bit = PI.inflate_blocks(
            stream, [offs], interpret=interpret)
        if err[0]:
            raise PallasDecodeError(f"block at bit {offs}: kernel error")
        out += o[0, :produced[0]].tobytes()
        offs = int(end_bit[0])
        if bfinal:
            return bytes(out)
    raise PallasDecodeError("too many blocks")
