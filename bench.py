"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline: DEFLATE encode throughput (level 2, the "fast" level) on one chip,
MB/s of input consumed, with bit-exact output verified against python zlib.

Baseline anchor (BASELINE.md): the reference's level-2 hash-chain compressor
measures ~15 MB/s on one CPU core — and even that emits corrupt streams
(SURVEY.md B1); its fastest *correct* level runs at ~16-50 KB/s.  We compare
against the generous 15 MB/s number.
"""
from __future__ import annotations

import json
import time

import numpy as np

REF_ENCODE_MBPS = 15.0          # reference level-2, one CPU core (BASELINE.md)
BATCH = 64                      # blocks per device call (2 MiB input)
NBATCH = 8                      # total 16 MiB corpus
LEVEL = 2


def make_corpus(rng, nbytes: int) -> bytes:
    """Mixed synthetic corpus: text-ish, repetitive, and random segments."""
    segs = []
    per = nbytes // 4
    segs.append(rng.integers(97, 123, per, dtype=np.uint8))           # text
    pat = rng.integers(0, 256, 509, dtype=np.uint8)
    segs.append(np.tile(pat, per // 509 + 1)[:per])                   # repeats
    words = rng.integers(32, 127, (per // 8, 6), dtype=np.uint8)
    segs.append(np.concatenate(
        [np.concatenate([w, np.array([32, 32], np.uint8)]) for w in
         words[:per // 8]])[:per])                                    # words
    segs.append(rng.integers(0, 256, nbytes - 3 * per, dtype=np.uint8))
    return np.concatenate(segs).tobytes()


def main():
    import jax
    import jax.numpy as jnp

    from deflate_tpu.models import encoder as E
    from deflate_tpu.ops.bitpack import words_to_bytes
    from deflate_tpu.runtime import stitch as S
    from deflate_tpu.utils.tables import BLOCK_SIZE

    rng = np.random.default_rng(42)
    nbytes = BATCH * NBATCH * BLOCK_SIZE
    corpus = make_corpus(rng, nbytes)
    buf = np.frombuffer(corpus, dtype=np.uint8)

    batches = []
    for j in range(NBATCH):
        blocks = buf[j * BATCH * BLOCK_SIZE:(j + 1) * BATCH * BLOCK_SIZE]
        blocks = jnp.asarray(blocks.reshape(BATCH, BLOCK_SIZE))
        batches.append(blocks)
    blens = jnp.full((BATCH,), BLOCK_SIZE, jnp.int32)
    live = jnp.ones((BATCH,), bool)

    def run_once():
        outs = []
        phase = jnp.int32(0)
        for j, blocks in enumerate(batches):
            fi = jnp.int32(BATCH - 1) if j == NBATCH - 1 else jnp.int32(-1)
            w, t = E.encode_batch(blocks, blens, live, fi, LEVEL, phase)
            phase = (phase + t) & 7
            outs.append((w, t))
        jax.block_until_ready(outs)
        return outs

    # warmup + compile
    outs = run_once()

    # verify once: stitch + zlib round trip
    segments = [(np.asarray(w), int(t)) for w, t in outs]
    words, total = S.stitch_segments(segments)
    encoded = S.words_to_bytes(words, total)
    import zlib
    assert zlib.decompress(encoded, -15) == corpus, "round trip failed"

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        run_once()
    dt = (time.perf_counter() - t0) / iters

    mbps = nbytes / dt / 1e6
    ratio = len(encoded) / nbytes
    result = {
        "metric": "encode_throughput_L2",
        "value": round(mbps, 2),
        "unit": "MB/s",
        "vs_baseline": round(mbps / REF_ENCODE_MBPS, 2),
        "extra": {
            "input_bytes": nbytes,
            "compressed_bytes": len(encoded),
            "ratio": round(ratio, 4),
            "device": str(jax.devices()[0].platform),
            "note": "baseline = reference level-2 ~15 MB/s 1 CPU core "
                    "(which emits CORRUPT output, SURVEY.md B1); "
                    "our output verified vs python zlib",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
