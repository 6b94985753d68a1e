"""Block-index manifest: seekable, restartable, parallel-decodable streams.

Reference analog: none — the closest thing is the 32 KiB-chunk callback
seam (deflate.hpp:680, 762-772); SURVEY.md §5.4 mandates a manifest so huge
streams can be resumed and decoded per shard.  Because this encoder keeps
blocks independent (quirk Q5 — matches never cross block boundaries), any
block can be decoded knowing only its bit span, which makes random access
and distributed decode trivial.

Format (JSON): {version, block_size, total_bits, blocks: [[bit_off,
bit_len, out_len], ...]}.
"""
from __future__ import annotations

import dataclasses
import json

import numpy as np

from deflate_tpu.utils.tables import BLOCK_SIZE

VERSION = 1


@dataclasses.dataclass
class Manifest:
    block_size: int
    total_bits: int
    blocks: list[tuple[int, int, int]]     # (bit_offset, bit_len, out_len)

    def to_json(self) -> str:
        return json.dumps({"version": VERSION, "block_size": self.block_size,
                           "total_bits": self.total_bits,
                           "blocks": [list(b) for b in self.blocks]})

    @classmethod
    def from_json(cls, s: str) -> "Manifest":
        d = json.loads(s)
        if d.get("version") != VERSION:
            raise ValueError(f"unsupported manifest version {d.get('version')}")
        return cls(d["block_size"], d["total_bits"],
                   [tuple(b) for b in d["blocks"]])

    @property
    def out_size(self) -> int:
        return sum(b[2] for b in self.blocks)

    def blocks_for_range(self, start: int, end: int):
        """Indices of blocks covering output bytes [start, end)."""
        out = []
        pos = 0
        for i, (_, _, olen) in enumerate(self.blocks):
            if pos < end and pos + olen > start:
                out.append(i)
            pos += olen
            if pos >= end:
                break
        return out


def compress_with_manifest(data, level: int = 2):
    """Compress on the TPU path and return (stream bytes, Manifest).

    The manifest records every block's bit span and output size, computed
    from the same per-block choices the encoder made.
    """
    import jax.numpy as jnp

    import deflate_tpu
    from deflate_tpu.models import encoder as E

    buf = deflate_tpu._as_u8(data)
    nblocks = max(1, -(-len(buf) // BLOCK_SIZE))
    stream = deflate_tpu.compress(data, level)

    # recompute exact per-block spans with the size-only planner
    blocks = np.zeros((nblocks, BLOCK_SIZE), np.uint8)
    blens = np.zeros((nblocks,), np.int32)
    for i in range(nblocks):
        chunk = buf[i * BLOCK_SIZE:(i + 1) * BLOCK_SIZE]
        blocks[i, :len(chunk)] = chunk
        blens[i] = len(chunk)
    live = np.ones((nblocks,), bool)
    _, _, offset, bits = E.plan_sizes(
        jnp.asarray(blocks), jnp.asarray(blens), jnp.asarray(live), level)
    offset = np.asarray(offset)
    bits = np.asarray(bits)
    man = Manifest(BLOCK_SIZE, int(offset[-1] + bits[-1]),
                   [(int(offset[i]), int(bits[i]), int(blens[i]))
                    for i in range(nblocks)])
    return stream, man


def decode_all(stream: bytes, man: Manifest, device: bool = False,
               interpret: bool = False) -> bytes:
    """Decode an entire manifest-indexed stream.

    device=True batches every block through the Pallas inflate kernel in
    one launch (models/pallas_decoder.py) — the throughput decode path —
    with transparent host fallback on kernel-flagged blocks."""
    if device:
        from deflate_tpu.models import pallas_decoder as PD

        try:
            return PD.inflate_manifest(stream, man.blocks,
                                       interpret=interpret)
        except PD.PallasDecodeError:
            pass
    from deflate_tpu.models import host_inflate as HI

    out = bytearray()
    for bit_off, _, _ in man.blocks:
        out += HI.inflate_raw(stream, start_bit=bit_off, single_block=True)
    return bytes(out)


def decode_range(stream: bytes, man: Manifest, start: int, end: int) -> bytes:
    """Random-access decode of output bytes [start, end) without touching
    the rest of the stream — possible because blocks are independent (Q5)."""
    import deflate_tpu

    from deflate_tpu.models import host_inflate as HI

    end = min(end, man.out_size)
    if start >= end:
        return b""
    idxs = man.blocks_for_range(start, end)
    out = bytearray()
    base = sum(b[2] for b in man.blocks[:idxs[0]])
    for i in idxs:
        bit_off, _, _ = man.blocks[i]
        # decode exactly one block at its original bit phase — the stored-
        # block byte-align padding depends on the absolute stream phase
        out += HI.inflate_raw(stream, start_bit=bit_off, single_block=True)
    return bytes(out[start - base:end - base])
