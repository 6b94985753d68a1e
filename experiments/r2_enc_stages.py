"""Per-stage timing of the encoder on the real chip (VERDICT r1 #2)."""
import sys
import time

import numpy as np

sys.path.insert(0, "..")
sys.path.insert(0, "experiments")
from r2_decode_prof import corpus  # noqa: E402


def timeit(name, fn, *args, reps=3):
    import jax
    import jax.numpy as jnp
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    int(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.int32))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    int(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.int32))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    import functools
    import jax
    import jax.numpy as jnp

    from deflate_tpu.models import encoder as E
    from deflate_tpu.ops import lz77 as LZ
    from deflate_tpu.utils.tables import BLOCK_SIZE

    NB = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    LEVEL = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    rng = np.random.default_rng(42)
    nbytes = NB * BLOCK_SIZE
    import bench
    data = bench.make_corpus(rng, nbytes)
    buf = np.frombuffer(data, np.uint8)
    blocks = jnp.asarray(buf.reshape(NB, BLOCK_SIZE))
    blens = jnp.full((NB,), BLOCK_SIZE, jnp.int32)
    live = jnp.ones((NB,), bool)
    P = functools.partial

    pack = E._default_pack()
    print("pack backend:", pack)

    full = jax.jit(P(E.encode_batch, level=LEVEL, pack=pack))
    timeit("FULL encode_batch", lambda: full(
        blocks, blens, live, np.int32(NB - 1)))

    # stage A parts
    tok = jax.jit(jax.vmap(P(LZ.find_matches, num_cands=4, win_words=8)))
    timeit("A1 find_matches", tok, blocks, blens)

    pre = jax.jit(jax.vmap(P(E._plan_pre, level=LEVEL)))
    timeit("A1+A2 plan_pre (tokens+sorts+hists)", pre, blocks, blens)

    planf = jax.jit(P(E.batch_plan, level=LEVEL,
                      trees="kernel" if pack == "kernel" else "xla"))
    timeit("A batch_plan (pre+trees+header)", planf, blocks, blens)

    plans = planf(blocks, blens)

    @jax.jit
    def stage_bc(blocks, blens, live):
        choice, pad, offset, bits = E.choose_blocks(
            plans["fixed_bits"], plans["dyn_bits"], blens, live, LEVEL, 0)
        return choice, pad, offset

    timeit("B choose_blocks", stage_bc, blocks, blens, live)
    choice, pad, offset = stage_bc(blocks, blens, live)
    bfinal = jnp.arange(NB) == NB - 1

    if pack == "kernel":
        from deflate_tpu.ops import pallas_pack as PK

        @jax.jit
        def emitf(blocks, blens, choice, pad):
            return jax.vmap(
                lambda bl, ln, i, ch, pd, bf: E.build_packets(
                    bl, ln, jax.tree.map(lambda x: x[i], plans),
                    ch, pd, bf)
            )(blocks, blens, jnp.arange(NB), choice, pad, bfinal)

        timeit("C1 build_packets", emitf, blocks, blens, choice, pad)
        offp, lop, hip, counts, nbitsp, storedv = emitf(
            blocks, blens, choice, pad)
        timeit("C2 pallas pack_blocks",
               jax.jit(PK.pack_blocks), counts, offp, lop, hip)


if __name__ == "__main__":
    main()
