"""Round-4: reproduce + bisect the 735 s L2-encode compile (VERDICT #1).

Measures lower+compile wall time of the bench's `step` program on CPU
with the persistent cache disabled, optionally for sub-stages, so the
regression introduced in cbe0227 can be bisected.

Usage: env JAX_PLATFORMS=cpu DEFLATE_TPU_COMPILE_CACHE= \
           python experiments/r4_compile_probe.py [stage]
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["DEFLATE_TPU_COMPILE_CACHE"] = ""

import jax
import jax.numpy as jnp
import numpy as np

from deflate_tpu.models import encoder as E
from deflate_tpu.utils.tables import BLOCK_SIZE

NBLOCKS = int(os.environ.get("NB", "256"))
LEVEL = int(os.environ.get("LEVEL", "2"))


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    print(f"{name}: lower {t1 - t0:.1f}s compile {t2 - t1:.1f}s",
          flush=True)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "full"
    rng = np.random.default_rng(0)
    buf = rng.integers(0, 256, NBLOCKS * BLOCK_SIZE, dtype=np.uint8)
    blocks = jnp.asarray(buf.reshape(NBLOCKS, BLOCK_SIZE))
    blens = jnp.full((NBLOCKS,), BLOCK_SIZE, jnp.int32)
    live = jnp.ones((NBLOCKS,), bool)

    if stage == "full":
        def step(blocks):
            w, t, off, bits = E.encode_batch_with_offsets(
                blocks, blens, live, np.int32(NBLOCKS - 1), LEVEL, 0)
            return w, t, off, t + w[0].astype(jnp.int32)
        timeit("full encode_batch_with_offsets", step, blocks)
    elif stage == "plan":
        timeit("batch_plan", lambda b: E.batch_plan(b, blens, LEVEL),
               blocks)
    elif stage == "choose":
        def f(b):
            plans = E.batch_plan(b, blens, LEVEL)
            return E.choose_blocks(plans["fixed_bits"], plans["dyn_bits"],
                                   blens, live, LEVEL, 0)
        timeit("plan+choose", f, blocks)
    else:
        print(f"unknown stage {stage}")


def bench_flow():
    """Reproduce the bench's compile->run->d2h sequence with fine marks."""
    import zlib

    from deflate_tpu.runtime import stitch as S

    rng = np.random.default_rng(42)
    sys.path.insert(0, "/root/repo")
    import importlib
    bench = importlib.import_module("bench")
    corpus = bench.make_corpus(rng, NBLOCKS * BLOCK_SIZE)
    buf = np.frombuffer(corpus, dtype=np.uint8)
    blocks = jnp.asarray(buf.reshape(NBLOCKS, BLOCK_SIZE))
    blens = jnp.full((NBLOCKS,), BLOCK_SIZE, jnp.int32)
    live = jnp.ones((NBLOCKS,), bool)

    def step(blocks):
        w, t, off, bits = E.encode_batch_with_offsets(
            blocks, blens, live, np.int32(NBLOCKS - 1), LEVEL, 0)
        return w, t, off, t + w[0].astype(jnp.int32)

    t0 = time.perf_counter()
    f = jax.jit(step).lower(blocks).compile()
    t1 = time.perf_counter()
    print(f"compile {t1-t0:.1f}s", flush=True)
    words, total, offs, s = f(blocks)
    tot = int(total)                       # scalar sync
    t2 = time.perf_counter()
    print(f"first-run+scalar-sync {t2-t1:.1f}s", flush=True)
    wnp = np.asarray(words)                # bulk d2h
    t3 = time.perf_counter()
    print(f"bulk-d2h {t3-t2:.1f}s ({wnp.nbytes/1e6:.1f} MB)", flush=True)
    encoded = S.words_to_bytes(wnp, tot)
    assert zlib.decompress(encoded, -15) == corpus
    t4 = time.perf_counter()
    print(f"host-verify {t4-t3:.1f}s", flush=True)


if __name__ == "__main__":
    if sys.argv[1:2] == ["benchflow"]:
        bench_flow()
    else:
        main()
