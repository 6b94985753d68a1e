"""Round-2 decode kernel profiling: MB/s by corpus composition.

Encodes three 8 MiB corpora with the device encoder (level 2), then times
the Pallas inflate kernel on each.  Corpus mix isolates the kernel's two
hot paths: literal-dominated (text), match-dominated (repetitive), and
stored (random).  Run on the real chip:

    python experiments/r2_decode_prof.py [text|rep|rand|mixed ...]

Env knobs: PI_K (chains/cell).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def corpus(kind, nbytes, rng):
    if kind == "text":
        words = rng.integers(97, 123, (nbytes // 8, 6), dtype=np.uint8)
        segs = np.concatenate(
            [np.concatenate([w, np.array([32, 32], np.uint8)])
             for w in words])
        return segs[:nbytes].tobytes()
    if kind == "rep":
        pat = rng.integers(0, 256, 509, dtype=np.uint8)
        return np.tile(pat, nbytes // 509 + 1)[:nbytes].tobytes()
    if kind == "rand":
        return rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes()
    # mixed: the bench corpus
    sys.path.insert(0, ".")
    import bench
    return bench.make_corpus(rng, nbytes)


def main():
    import jax
    import jax.numpy as jnp

    from deflate_tpu.models import encoder as E
    from deflate_tpu.ops import pallas_inflate as PI
    from deflate_tpu.runtime import stitch as S
    from deflate_tpu.utils.tables import BLOCK_SIZE

    kinds = sys.argv[1:] or ["text", "rep", "rand", "mixed"]
    NB = 256
    rng = np.random.default_rng(7)
    nbytes = NB * BLOCK_SIZE

    @jax.jit
    def enc(blocks, blens, live):
        w, t, off, bits = E.encode_batch_with_offsets(
            blocks, blens, live, np.int32(NB - 1), 2, 0)
        return w, t, off

    import zlib
    for kind in kinds:
        data = corpus(kind, nbytes, rng)
        buf = np.frombuffer(data, np.uint8)
        blocks = jnp.asarray(buf.reshape(NB, BLOCK_SIZE))
        blens = jnp.full((NB,), BLOCK_SIZE, jnp.int32)
        live = jnp.ones((NB,), bool)
        w, t, off = enc(blocks, blens, live)
        stream = S.words_to_bytes(np.asarray(w), int(t))
        assert zlib.decompress(stream, -15) == data
        offs = np.asarray(off, np.int64)

        args, grid, inv, _ = PI.prepare_blocks(stream, offs)

        def dstep():
            _, s = PI._inflate_blocks_jit(*args, grid=grid)
            return s

        s = dstep()
        int(np.asarray(s[0, 0]))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            s = dstep()
        int(np.asarray(s[0, 0]))
        dt = (time.perf_counter() - t0) / reps
        ratio = len(stream) / nbytes
        sn = np.asarray(s).reshape(grid, PI.K, 4)
        iters = int((sn[:, :, 3].max(axis=1) >> 1).sum())
        print(f"{kind:6s} ratio={ratio:.3f} decode={nbytes/dt/1e6:7.1f} "
              f"MB/s  ({dt*1e3:.1f} ms, {iters} iters, "
              f"{dt/max(iters,1)*1e9:.0f} ns/cell-iter)", flush=True)


if __name__ == "__main__":
    main()
