"""Round-3 decode budget: per-bucket device time + host prep breakdown
on the exact bench corpus/stream (256 blocks, 8 MiB)."""
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

    # ---- host prep breakdown ----
    t0 = time.perf_counter()
    md = W.parse_headers_host(stream, offs)
    t_hdr = time.perf_counter() - t0

    t0 = time.perf_counter()
    prep, calls = WD.prepare_bucketed(stream, offs, sizes, hints)
    t_prep = time.perf_counter() - t0
    print(f"host parse_headers: {t_hdr*1e3:8.2f} ms")
    print(f"host prepare_bucketed total: {t_prep*1e3:8.2f} ms")
    for sel, (buf, off), W64, n, npad, mx in calls:
        print(f"  bucket W64={W64:5d}: n={n:4d} npad={npad} off={off}")

    # ---- per-bucket device time ----
    for sel, (buf, off), W64, n, npad, mx in calls:
        f = lambda: WD.wave_decode_packed(buf, W64, n, npad, off=off,
                                          maxl=mx[0], maxd=mx[1])
        out = f()
        int(jnp.sum(out[:, 0]))
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f()
        int(jnp.sum(out[:, 0]) + jnp.sum(out[:, -1]))
        dt = (time.perf_counter() - t0) / reps
        nb = n * BLOCK_SIZE
        print(f"  bucket W64={W64:5d}: {dt*1e3:8.2f} ms "
              f"({nb/dt/1e6:7.1f} MB/s over {n} blocks)")

    # ---- all buckets pipelined (the bench's dstep) ----
    def dstep():
        return [WD.wave_decode_packed(buf, W64, n, npad, off=off,
                                      maxl=mx[0], maxd=mx[1])
                for _, (buf, off), W64, n, npad, mx in calls]

    outs = dstep()
    int(jnp.sum(outs[-1][:, 0]))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        outs = dstep()
    int(jnp.sum(outs[-1][:, 0]))
    dt = (time.perf_counter() - t0) / reps
    print(f"ALL buckets device: {dt*1e3:8.2f} ms "
          f"({NB*BLOCK_SIZE/dt/1e6:7.1f} MB/s)")

    # ---- output reassembly cost (d2h + stitch) ----
    for i in range(3):
        t0 = time.perf_counter()
        got, derr = WD.inflate_wave(stream, offs, sizes, hints)
        t_e2e = time.perf_counter() - t0
        assert got == corpus and not derr.any()
        print(f"inflate_wave e2e run {i}: {t_e2e*1e3:8.2f} ms "
              f"({NB*BLOCK_SIZE/t_e2e/1e6:7.1f} MB/s)")


if __name__ == "__main__":
    main()
