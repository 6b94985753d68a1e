"""Round-4: pin down per-bucket wave-decode device time.

r3_decode_prof showed bucket W64=512 at ~360 ms/call while the
pipelined all-buckets loop finished 3 programs in 74 ms — physically
impossible on one device, so one of the timing modes lies (axon-tunnel
dispatch artifacts).  This probe times each bucket both ways and in
both orders.

Usage: python experiments/r4_bucket_probe.py
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

    # warm + verify everything first
    for _, (b, o), W64, n, npad, mx in calls:
        out = WD.wave_decode_packed(b, W64, n, npad, off=o,
                                    maxl=mx[0], maxd=mx[1])
        assert int(jnp.sum(out[:, -1])) == 0, f"decode err in W64={W64}"
    print("all buckets warmed, err=0", flush=True)

    def timed(order, mode, reps=5):
        for _, (b, o), W64, n, npad, mx in order:
            t0 = time.perf_counter()
            if mode == "pipelined":
                for _ in range(reps):
                    out = WD.wave_decode_packed(b, W64, n, npad, off=o,
                                                maxl=mx[0], maxd=mx[1])
                int(jnp.sum(out[:, 0]) + jnp.sum(out[:, -1]))
            else:
                for _ in range(reps):
                    out = WD.wave_decode_packed(b, W64, n, npad, off=o,
                                                maxl=mx[0], maxd=mx[1])
                    int(jnp.sum(out[:, 0]))
            dt = (time.perf_counter() - t0) / reps
            nb = n * BLOCK_SIZE
            print(f"  [{mode:9s}] W64={W64:5d}: {dt*1e3:8.2f} ms "
                  f"({nb/dt/1e6:7.1f} MB/s)", flush=True)

    timed(calls, "pipelined")
    timed(calls[::-1], "pipelined")
    timed(calls, "syncd")


if __name__ == "__main__":
    main()
