"""Round-3: split encode stage C1 (build_packets / _emit_fields) into
its internal stages on the bench corpus — where do 49.8 ms go?"""
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
    from deflate_tpu.ops import huffman as H
    from deflate_tpu.utils import tables as T
    from deflate_tpu.ops.wave import route_monotone_left

    NB = 256
    N = T.BLOCK_SIZE
    rng = np.random.default_rng(42)
    corpus = make_corpus(rng, NB * N)
    buf = np.frombuffer(corpus, np.uint8)
    blocks = jnp.asarray(buf.reshape(NB, N))
    blens = jnp.full((NB,), N, jnp.int32)
    live = jnp.ones((NB,), bool)

    def timeit(name, fn, *args, reps=5):
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
        return out

    # plans once (stage A) — inputs to C1
    plan_f = jax.jit(lambda b, l: E.batch_plan(b, l, 2, trees="kernel"))
    plans = plan_f(blocks, blens)
    choice, pad, offset, bits = jax.jit(E.choose_blocks, static_argnums=(4,))(
        plans["fixed_bits"], plans["dyn_bits"], blens, live, 2, 0)
    bfinal = jnp.arange(NB) == NB - 1

    J = jnp.asarray

    # --- C1 pieces, each vmapped over blocks --------------------------
    def apply_lit(i):
        p = jax.tree.map(lambda x: x[i], plans)
        cnt_l = p["hist_lit"].at[256].add(-1)
        rank, nc = H.canonical_parts(p["dyn_lit_lens"])
        return E._apply_table_sorted(p["skey_l"], cnt_l[:286],
                                     p["dyn_lit_lens"], rank, nc, 286)

    timeit("C1a lit sorted-apply (seed+cummax+RESTORE)",
           jax.jit(jax.vmap(apply_lit)), jnp.arange(NB))

    def apply_lit_nosort(i):
        p = jax.tree.map(lambda x: x[i], plans)
        cnt_l = p["hist_lit"].at[256].add(-1)
        dyn_lit_codes, _ = H.canonical_codes(p["dyn_lit_lens"])
        counts = cnt_l[:286]
        codes, lens = dyn_lit_codes, p["dyn_lit_lens"]
        starts = jnp.cumsum(counts) - counts
        pack = codes[:286] | (lens[:286] << 15)
        tgt = jnp.where(counts > 0, starts, N)
        binno = jnp.arange(286, dtype=jnp.int32)
        seed = jnp.full((N,), -1, jnp.int32).at[tgt].set(
            (binno << 20) | pack, mode="drop")
        filled = jax.lax.cummax(seed) & ((1 << 20) - 1)
        return filled

    timeit("C1a' lit apply WITHOUT restore sort",
           jax.jit(jax.vmap(apply_lit_nosort)), jnp.arange(NB))

    def dist_chain(i):
        p = jax.tree.map(lambda x: x[i], plans)
        tk = p["tk"]
        dyn_dist_codes, _ = H.canonical_codes(p["dyn_dist_lens"])
        dpack = dyn_dist_codes[:30] | (p["dyn_dist_lens"][:30] << 15)
        dsel = jnp.zeros((N,), jnp.int32)
        for s in range(30):
            dsel = jnp.where(tk["dcode"] == s, dpack[s], dsel)
        return dsel

    timeit("C1b dist select-chain", jax.jit(jax.vmap(dist_chain)),
           jnp.arange(NB))

    def fields_only(i, ch, pd, bf):
        p = jax.tree.map(lambda x: x[i], plans)
        return E._emit_fields(blocks[i], blens[i], p, ch, pd, bf)["sh"]

    timeit("C1 _emit_fields total", jax.jit(jax.vmap(fields_only)),
           jnp.arange(NB), choice, pad, bfinal)

    def packets(i, ch, pd, bf):
        p = jax.tree.map(lambda x: x[i], plans)
        return E.build_packets(blocks[i], blens[i], p, ch, pd, bf)[0]

    timeit("C1 build_packets total (fields+route+cumsum)",
           jax.jit(jax.vmap(packets)), jnp.arange(NB), choice, pad,
           bfinal)

    # routing compaction alone at [N+1] x NB
    def route_only(lo, delta):
        (s,), d = route_monotone_left([lo], delta, 16)
        return s

    lo = jnp.zeros((NB, N + 1), jnp.int32)
    lane = jnp.arange(N + 1, dtype=jnp.int32)[None]
    delta = jnp.where((lane % 3) == 0, lane - lane // 3, -1)
    delta = jnp.broadcast_to(delta, (NB, N + 1))
    timeit("C1c route compaction alone (1 payload)",
           jax.jit(jax.vmap(route_only)), lo, delta)


if __name__ == "__main__":
    main()
