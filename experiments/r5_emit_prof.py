"""Round-5 fine-grained emit/pack sub-stage timing on the real chip.

VERDICT r4 #1: emit 49 ms + pack 26 ms of the ~162 ms 256-block bucket.
This script splits emit into its internals so the restructure targets the
right piece:
  E1  _emit_fields (table apply + field fuse + 4-level packet fusion)
  E2  _packet_pre  (E1 + delta computation)
  E3  _route_packets (Pallas compaction kernel alone, fed from E2)
  E4  _packet_post (cumsum offsets)
  P   pack_blocks (scalar-core OR loop)
  F   _finish_block
Plus the within-E1 pieces: table apply, dist chain, fuse, hierarchy.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(name, fn, *args, reps=5):
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
    from deflate_tpu.utils.tables import BLOCK_SIZE

    NB = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    LEVEL = 2
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
    print("pack backend:", pack, flush=True)

    full = jax.jit(P(E.encode_batch, level=LEVEL, pack=pack))
    timeit("FULL encode_batch", lambda: full(
        blocks, blens, live, np.int32(NB - 1)))

    planf = jax.jit(P(E.batch_plan, level=LEVEL,
                      trees="kernel" if pack == "kernel" else "xla"))
    timeit("A batch_plan", planf, blocks, blens)
    plans = jax.tree.map(lambda x: x.block_until_ready(), planf(blocks, blens))

    @jax.jit
    def stage_bc(blens, live):
        return E.choose_blocks(plans["fixed_bits"], plans["dyn_bits"],
                               blens, live, LEVEL, 0)

    timeit("B choose_blocks", stage_bc, blens, live)
    choice, pad, offset, bits = stage_bc(blens, live)
    bfinal = jnp.arange(NB) == NB - 1

    @jax.jit
    def e1(blocks, blens, choice, pad):
        return jax.vmap(
            lambda bl, ln, i, ch, pd, bf: E._emit_fields(
                bl, ln, jax.tree.map(lambda x: x[i], plans), ch, pd, bf)
        )(blocks, blens, jnp.arange(NB), choice, pad, bfinal)

    timeit("E1 _emit_fields", e1, blocks, blens, choice, pad)

    @jax.jit
    def e2(blocks, blens, choice, pad):
        return jax.vmap(
            lambda bl, ln, i, ch, pd, bf: E._packet_pre(
                bl, ln, jax.tree.map(lambda x: x[i], plans), ch, pd, bf)
        )(blocks, blens, jnp.arange(NB), choice, pad, bfinal)

    timeit("E2 _packet_pre (incl E1)", e2, blocks, blens, choice, pad)
    pre = jax.tree.map(lambda x: x.block_until_ready(),
                       e2(blocks, blens, choice, pad))

    route = jax.jit(E._route_packets)
    timeit("E3 _route_packets (pallas)", route, pre)
    slo, shi, ssh = route(pre)
    slo.block_until_ready()

    post = jax.jit(jax.vmap(E._packet_post))
    timeit("E4 _packet_post (cumsum)", post, pre, slo, shi, ssh)
    offp, lop, hip, counts, nbitsp, storedv = post(pre, slo, shi, ssh)

    if pack == "kernel":
        from deflate_tpu.ops import pallas_pack as PK
        timeit("P  pack_blocks", jax.jit(PK.pack_blocks),
               counts, offp, lop, hip)
        words = jax.jit(PK.pack_blocks)(counts, offp, lop, hip)
        words = words[:, :E.WB].block_until_ready()

        fin = jax.jit(jax.vmap(E._finish_block))
        timeit("F  _finish_block", fin, words, blocks, blens, storedv,
               pad, nbitsp)

    # ---- E1 internals ----------------------------------------------------
    from deflate_tpu.ops import huffman as H
    from deflate_tpu.utils import tables as T
    _J = jnp.asarray
    N = T.BLOCK_SIZE

    @jax.jit
    def tab_apply(choice):
        def one(i, ch):
            plan = jax.tree.map(lambda x: x[i], plans)
            dyn = ch == E.CH_DYN
            dyn_lit_rank, dyn_lit_nc = H.canonical_parts(plan["dyn_lit_lens"])
            fx_lit_rank, fx_lit_nc = H.canonical_parts(
                _J(T.FIXED_LITLEN_LENGTHS))
            lit_rank = jnp.where(dyn, dyn_lit_rank,
                                 fx_lit_rank[:T.NUM_LITLEN])
            lit_nc = jnp.where(dyn, dyn_lit_nc, fx_lit_nc)
            lit_lens = jnp.where(dyn, plan["dyn_lit_lens"],
                                 _J(T.FIXED_LITLEN_LENGTHS))
            cnt_l = plan["hist_lit"].at[256].add(-1)
            return E._apply_table_sorted(plan["skey_l"], cnt_l[:286],
                                         lit_lens, lit_rank, lit_nc, 286)
        return jax.vmap(one)(jnp.arange(NB), choice)

    timeit("E1a _apply_table_sorted (lit)", tab_apply, choice)

    @jax.jit
    def dist_chain(blocks, blens, choice):
        def one(bl, ln, i):
            plan = jax.tree.map(lambda x: x[i], plans)
            tk = E.tokenize_block(bl, ln, LEVEL)
            dyn = choice[i] == E.CH_DYN
            dyn_dist_codes, _ = H.canonical_codes(plan["dyn_dist_lens"])
            fx_dist_codes, _ = H.canonical_codes(_J(T.FIXED_DIST_LENGTHS))
            dist_codes = jnp.where(dyn, dyn_dist_codes, fx_dist_codes[:30])
            dist_lens = jnp.where(dyn, plan["dyn_dist_lens"],
                                  _J(T.FIXED_DIST_LENGTHS)[:30])
            dpack = dist_codes[:30] | (dist_lens[:30] << 15)
            dsel = jnp.zeros((N,), jnp.int32)
            for s in range(30):
                dsel = jnp.where(tk["dcode"] == s, dpack[s], dsel)
            return dsel
        return jax.vmap(one)(blocks, blens, jnp.arange(NB))

    timeit("E1b tokenize+dist chain", dist_chain, blocks, blens, choice)

    @jax.jit
    def tok_only(blocks, blens):
        return jax.vmap(lambda b, l: E.tokenize_block(b, l, LEVEL))(
            blocks, blens)

    timeit("E1b' tokenize alone", tok_only, blocks, blens)


if __name__ == "__main__":
    main()
