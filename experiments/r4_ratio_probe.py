"""Round-4: ratio audit vs zlib across corpus types (VERDICT #3).

CPU-runnable: sizes are hardware-independent.  Prints per-corpus bytes
for zlib-6/zlib-9 and our L2/L3 so the parse-quality gap is visible per
content class.

Usage: env JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
          python experiments/r4_ratio_probe.py [L2|L3|both]
"""
from __future__ import annotations

import os
import sys
import zlib

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["DEFLATE_TPU_COMPILE_CACHE"] = ""

import numpy as np


def corpora(rng):
    out = {}
    n = 100_000
    # words: random 6-char words + 2 spaces (the bench words segment)
    words = rng.integers(32, 127, (n // 8, 6), dtype=np.uint8)
    out["words100k"] = np.concatenate(
        [np.concatenate([w, np.array([32, 32], np.uint8)])
         for w in words])[:n].tobytes()
    # repetitive text: a 73-byte sentence tiled
    sent = b"the quick brown fox jumps over the lazy dog while the cat naps quietly. "
    out["sent_tiled"] = (sent * (n // len(sent) + 1))[:n]
    # natural-ish text: zipf-weighted vocabulary of 200 words
    vocab = [bytes(rng.integers(97, 123, rng.integers(3, 9)).astype(np.uint8))
             for _ in range(200)]
    w = 1.0 / np.arange(1, 201)
    w /= w.sum()
    picks = rng.choice(200, 20_000, p=w)
    out["zipf_text"] = b" ".join(vocab[i] for i in picks)[:n]
    # tiled 509-byte pattern (the bench repeats segment)
    pat = rng.integers(0, 256, 509, dtype=np.uint8)
    out["pat509"] = np.tile(pat, n // 509 + 1)[:n].tobytes()
    # test.bmp if present
    bmp = "/root/reference/test.bmp"
    if os.path.exists(bmp):
        out["test.bmp"] = open(bmp, "rb").read()
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    import deflate_tpu as D

    rng = np.random.default_rng(7)
    corp = corpora(rng)
    levels = {"L2": 2, "L3": 3} if which == "both" else \
        {which: int(which[1])}
    print(f"{'corpus':>10} {'len':>7} {'z6':>7} {'z9':>7} "
          + "".join(f"{k:>7} {k + '%':>7} " for k in levels))
    for name, data in corp.items():
        z6 = len(zlib.compress(data, 6)) - 6
        z9 = len(zlib.compress(data, 9)) - 6
        row = f"{name:>10} {len(data):>7} {z6:>7} {z9:>7} "
        for k, lv in levels.items():
            enc = D.compress(data, level=lv)
            assert zlib.decompress(enc, -15) == data, name
            row += f"{len(enc):>7} {100 * (len(enc) - z9) / z9:>6.1f}% "
        print(row, flush=True)


if __name__ == "__main__":
    main()
