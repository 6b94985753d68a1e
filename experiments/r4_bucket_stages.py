"""Round-4: split the BENCH buckets' time into A-F vs fill vs glue.

The 3072/3584 buckets sit at ~27 ms regardless of stage-A round cuts
and fill micro-optimizations — this pins down what actually dominates.
"""
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from bench import make_corpus
    from deflate_tpu.models import encoder as E
    from deflate_tpu.models import wave_decoder as WD
    from deflate_tpu.ops import wave as W
    from deflate_tpu.ops import wave_fill as WF
    from deflate_tpu.runtime import stitch as S
    from deflate_tpu.utils.tables import BLOCK_SIZE

    NB = 256
    rng = np.random.default_rng(42)
    corpus = make_corpus(rng, NB * BLOCK_SIZE)
    buf = np.frombuffer(corpus, np.uint8)
    blocks = jnp.asarray(buf.reshape(NB, BLOCK_SIZE))
    blens = jnp.full((NB,), BLOCK_SIZE, jnp.int32)
    live = jnp.ones((NB,), bool)

    w, t, off, bits = jax.jit(
        E.encode_batch_with_offsets, static_argnums=(4,))(
        blocks, blens, live, np.int32(NB - 1), 2, 0)
    stream = S.words_to_bytes(np.asarray(w), int(t))
    offs = np.asarray(off, np.int64)
    sizes = np.full(NB, BLOCK_SIZE, np.int64)
    hints = np.asarray(jax.jit(
        E.encode_batch_with_hints, static_argnums=(4,))(
        blocks, blens, live, np.int32(NB - 1), 2, 0)[4], np.uint8)
    prep, calls = WD.prepare_bucketed(stream, offs, sizes, hints)

    @functools.partial(jax.jit, static_argnames=("off", "W64", "n",
                                                 "maxl", "maxd", "upto"))
    def partial_decode(packed, W64, n, off, maxl, maxd, upto):
        if off:
            packed = jax.lax.slice_in_dim(
                packed, off, off + WD._bucket_words(W64, n))
        nw, hs, sizes, mdj = WD._unpack_bucket(packed, W64, n)
        if upto == "unpack":
            return jnp.sum(nw) + jnp.sum(hs)
        lw, r0, r1, nm, prod, e = W.wave_decode(
            nw, hs, sizes, mdj, W64, maxl=maxl, maxd=maxd)
        if upto == "af":
            return (jnp.sum(lw[:, 0]) + jnp.sum(r0[:, 0]) + jnp.sum(nm)
                    + jnp.sum(prod) + jnp.sum(e))
        recs = WF.pack_fill_recs(r0, r1)
        filled = WF.fill_matches(lw, recs, nm, n)
        return jnp.sum(filled[:, 0]) + jnp.sum(prod)

    def timeit(name, fn, reps=3):
        int(fn())
        t0 = time.perf_counter()
        for _ in range(reps):
            s = fn()
        int(s)
        print(f"  {name:12s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms",
              flush=True)

    for _, (b, o), W64, n, npad, (ml, mdx) in calls:
        print(f"bucket W64={W64} n={n} maxl={ml} maxd={mdx}", flush=True)
        for upto in ("unpack", "af", "full"):
            timeit(upto, lambda u=upto: partial_decode(
                b, W64, n, o, ml, mdx, u))


if __name__ == "__main__":
    main()
