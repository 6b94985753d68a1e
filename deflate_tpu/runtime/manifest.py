"""Block-index manifest: seekable, restartable, parallel-decodable streams.

Reference analog: none — the closest thing is the 32 KiB-chunk callback
seam (deflate.hpp:680, 762-772); SURVEY.md §5.4 mandates a manifest so huge
streams can be resumed and decoded per shard.  Because this encoder keeps
blocks independent (quirk Q5 — matches never cross block boundaries), any
block can be decoded knowing only its bit span, which makes random access
and distributed decode trivial.

Format (JSON): {version, block_size, total_bits, blocks: [[bit_off,
bit_len, out_len], ...], hints?: base64, hint_lens?: [...]}.

v2 adds optional per-block DECODE HINTS — each 64-bit chunk's symbol
entry phase (1 byte/chunk, ~12% of the compressed size) — which the
encoder derives for free from its emit prefix sums and the wavefront
device decoder (models/wave_decoder.py) consumes to decode every chunk
of every block independently on the VPU.
"""
from __future__ import annotations

import base64
import dataclasses
import json

import numpy as np

from deflate_tpu.utils.tables import BLOCK_SIZE

VERSION = 2


@dataclasses.dataclass
class Manifest:
    block_size: int
    total_bits: int
    blocks: list[tuple[int, int, int]]     # (bit_offset, bit_len, out_len)
    hints: list[bytes] | None = None       # per-block chunk entry phases

    def to_json(self) -> str:
        d = {"version": VERSION, "block_size": self.block_size,
             "total_bits": self.total_bits,
             "blocks": [list(b) for b in self.blocks]}
        if self.hints is not None:
            d["hints"] = base64.b64encode(b"".join(self.hints)).decode()
            d["hint_lens"] = [len(h) for h in self.hints]
        return json.dumps(d)

    @classmethod
    def from_json(cls, s: str) -> "Manifest":
        d = json.loads(s)
        if d.get("version") not in (1, 2):
            raise ValueError(f"unsupported manifest version {d.get('version')}")
        hints = None
        if d.get("hints") is not None:
            blob = base64.b64decode(d["hints"])
            hints, p = [], 0
            for n in d["hint_lens"]:
                hints.append(blob[p:p + n])
                p += n
        return cls(d["block_size"], d["total_bits"],
                   [tuple(b) for b in d["blocks"]], hints)

    def hint_array(self):
        """[B, maxchunks] uint8 hints padded with HINT_NONE, or None."""
        if self.hints is None:
            return None
        from deflate_tpu.ops.wave import HINT_NONE
        cap = max((len(h) for h in self.hints), default=1)
        out = np.full((len(self.hints), cap), HINT_NONE, np.uint8)
        for i, h in enumerate(self.hints):
            out[i, :len(h)] = np.frombuffer(h, np.uint8)
        return out

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


def compress_with_manifest(data, level: int = 2, hints: bool = True):
    """Compress on the TPU path and return (stream bytes, Manifest).

    ONE encode produces the stream, the per-block spans, and (v2) the
    wavefront decode hints — no separate plan_sizes pass (the encoder
    already computes offsets/bits; VERDICT r1 weak #10).
    """
    import jax
    import jax.numpy as jnp

    import deflate_tpu
    from deflate_tpu.models import encoder as E
    from deflate_tpu.runtime import stitch as S

    buf = deflate_tpu._as_u8(data)
    nblocks = max(1, -(-len(buf) // BLOCK_SIZE))
    blocks = np.zeros((nblocks, BLOCK_SIZE), np.uint8)
    blens = np.zeros((nblocks,), np.int32)
    for i in range(nblocks):
        chunk = buf[i * BLOCK_SIZE:(i + 1) * BLOCK_SIZE]
        blocks[i, :len(chunk)] = chunk
        blens[i] = len(chunk)
    live = np.ones((nblocks,), bool)
    fn = E.encode_batch_with_hints if hints else E.encode_batch_with_offsets
    res = jax.jit(fn, static_argnums=(4,))(
        jnp.asarray(blocks), jnp.asarray(blens), jnp.asarray(live),
        np.int32(nblocks - 1), level, 0)
    words, total, offset, bits = res[:4]
    stream = S.words_to_bytes(np.asarray(words), int(total))
    offset = np.asarray(offset)
    bits = np.asarray(bits)
    hlist = None
    if hints:
        harr = np.asarray(res[4], np.uint8)
        hlist = [harr[i, :int(-(-bits[i] // 64))].tobytes()
                 for i in range(nblocks)]
    man = Manifest(BLOCK_SIZE, int(offset[-1] + bits[-1]),
                   [(int(offset[i]), int(bits[i]), int(blens[i]))
                    for i in range(nblocks)], hlist)
    return stream, man


def decode_all(stream: bytes, man: Manifest, device: bool = False,
               interpret: bool = False) -> bytes:
    """Decode an entire manifest-indexed stream.

    device=True uses the wavefront VPU decoder (models/wave_decoder.py)
    when the manifest carries v2 hints — the throughput decode path —
    else the Pallas scalar-core kernel; blocks any device path flags
    fall back to the host decoder individually."""
    from deflate_tpu.models import host_inflate as HI

    if device and man.hints is not None:
        from deflate_tpu.models import wave_decoder as WD

        offs = [b[0] for b in man.blocks]
        sizes = [b[2] for b in man.blocks]
        words, produced, err = WD.inflate_wave_device(
            stream, offs, sizes, man.hint_array(), interpret=interpret)
        w = np.asarray(words).view(np.uint8).reshape(len(man.blocks), -1)
        parts = []
        for i, (bit_off, _, olen) in enumerate(man.blocks):
            if err[i] or produced[i] != olen:       # per-block fallback
                parts.append(HI.inflate_raw(stream, start_bit=bit_off,
                                            single_block=True))
            else:
                parts.append(w[i, :olen].tobytes())
        return b"".join(parts)
    if device:
        from deflate_tpu.models import pallas_decoder as PD

        try:
            return PD.inflate_manifest(stream, man.blocks,
                                       interpret=interpret)
        except PD.PallasDecodeError:
            pass
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
