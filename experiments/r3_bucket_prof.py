"""Round-3: clean per-bucket device decode timing on the bench stream.

Warms every sync program before any timed region (the r3_decode_prof
per-bucket numbers were polluted by an in-region jnp.sum compile).
Reports per bucket: fused decode+fill, A-F only, fill only.
"""
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main():
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

    def sync(x):
        return int(jnp.sum(jnp.ravel(x)[:1]).astype(jnp.int32)
                   + jnp.sum(jnp.ravel(x)[-1:]).astype(jnp.int32))

    # warm EVERYTHING (decode programs + sync programs) before timing
    for _, (buf_d, off_), W64, n, npad in calls:
        sync(WD.wave_decode_packed(buf_d, W64, n, npad, off=off_))

    def timeit(name, fn, reps=8):
        fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:46s} {dt*1e3:9.2f} ms", flush=True)
        return dt

    tot = 0.0
    for sel, (buf_d, off_), W64, n, npad in calls:
        tot += timeit(
            f"bucket W64={W64:5d} n={n} fused",
            lambda b=buf_d, w=W64, nn=n, np_=npad, o=off_:
                WD.wave_decode_packed(b, w, nn, np_, off=o))

    print(f"sum of buckets: {tot*1e3:9.2f} ms", flush=True)

    def dstep():
        return [WD.wave_decode_packed(b, w, nn, np_, off=o)
                for _, (b, o), w, nn, np_ in calls][-1]
    timeit("ALL buckets pipelined", dstep)

    # A-F vs fill split per bucket (unpack once, time the two halves)
    from deflate_tpu.models.wave_decoder import _unpack_bucket, \
        _bucket_words
    import functools

    for sel, (buf_d, off_), W64, n, npad in calls:
        p = jax.lax.slice_in_dim(buf_d, off_, off_ + _bucket_words(W64, n)) \
            if off_ else buf_d
        nw, hs, sz, mdj = jax.jit(
            functools.partial(_unpack_bucket, W64=W64, n=n))(p)

        af = jax.jit(functools.partial(W.wave_decode, W64=W64))
        timeit(f"bucket W64={W64:5d} A-F only",
               lambda: af(nw, hs, sz, mdj)[0])
        lw, r0, r1, nm, prod, e = af(nw, hs, sz, mdj)
        recs = WF.pack_fill_recs(r0, r1)
        if npad != n:
            lw2 = jnp.pad(lw, ((0, npad - n), (0, 0)))
            recs2 = jnp.pad(recs, ((0, npad - n), (0, 0)))
            nm2 = jnp.pad(nm, (0, npad - n))
        else:
            lw2, recs2, nm2 = lw, recs, nm
        print(f"   nmatch: mean={int(np.asarray(nm).mean())} "
              f"max={int(np.asarray(nm).max())}", flush=True)
        timeit(f"bucket W64={W64:5d} fill only",
               lambda: WF.fill_matches(lw2, recs2, nm2, npad))


if __name__ == "__main__":
    main()
