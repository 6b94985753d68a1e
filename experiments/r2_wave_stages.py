"""Per-stage timing of the wavefront decoder on the real chip."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from r2_decode_prof import corpus  # noqa: E402


def timeit(name, fn, *args, reps=3):
    import jax
    import jax.numpy as jnp
    fn_j = jax.jit(fn) if not hasattr(fn, "lower") else fn
    out = fn_j(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    int(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.int32))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn_j(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    int(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.int32))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:42s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    import functools
    import jax
    import jax.numpy as jnp

    from deflate_tpu.models import encoder as E
    from deflate_tpu.ops import wave as W
    from deflate_tpu.ops import wave_fill as WF
    from deflate_tpu.runtime import stitch as S
    from deflate_tpu.utils.tables import BLOCK_SIZE

    NB = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    kind = sys.argv[1] if len(sys.argv) > 1 else "text"
    rng = np.random.default_rng(7)
    nbytes = NB * BLOCK_SIZE
    data = corpus(kind, nbytes, rng)
    buf = np.frombuffer(data, np.uint8)

    @jax.jit
    def enc(blocks):
        w, t, off, bits = E.encode_batch_with_offsets(
            blocks, jnp.full((NB,), BLOCK_SIZE, jnp.int32),
            jnp.ones((NB,), bool), np.int32(NB - 1), 2, 0)
        return w, t, off

    w, t, off = enc(jnp.asarray(buf.reshape(NB, BLOCK_SIZE)))
    stream = S.words_to_bytes(np.asarray(w), int(t))
    offs = np.asarray(off, np.int64)
    md = W.parse_headers_host(stream, offs)
    hints, span = W.hints_from_walk_host(stream, offs)
    W64 = int(sys.argv[3]) if len(sys.argv) > 3 else 4224
    nw = jnp.asarray(W.prepare_windows(stream, md["data_start"], W64))
    hs = np.full((NB, W64), W.HINT_NONE, np.uint8)
    hs[:, :min(W64, hints.shape[1])] = hints[:, :W64]
    hsj = jnp.asarray(hs, jnp.int32)
    sizes = jnp.full((NB,), BLOCK_SIZE, jnp.int32)
    mdj = {k: jnp.asarray(v) for k, v in md.items()
           if k.startswith(("l_", "d_"))}
    B, S_ = NB, 64 * W64

    P = functools.partial

    dp = jax.jit(P(W.decode_positions, W64=W64))
    timeit("A decode_positions (XLA)", dp, nw, mdj)
    A0, P1 = dp(nw, mdj)

    from deflate_tpu.ops.wave_stagea import decode_positions_pallas
    dpp = P(decode_positions_pallas, W64=W64)
    timeit("A decode_positions (Pallas)", dpp, nw, mdj)
    A0p, P1p = dpp(nw, mdj)
    same = bool(jnp.array_equal(A0, A0p) & jnp.array_equal(P1, P1p))
    print(f"   pallas == xla: {same}", flush=True)

    au = jax.jit(P(W.chunk_automaton, W64=W64))
    timeit("B automaton+rank", au, A0, hsj)
    sums, rank_rows = au(A0, hsj)
    sstart = jnp.cumsum(sums["sum_cnt"], axis=1) - sums["sum_cnt"]

    @jax.jit
    def stage_d(A0, P1, rank_rows, sstart, Mlo, Mhi):
        mk = W._unpack_marks(Mlo, Mhi, W64) > 0
        flat = lambda a: a.transpose(0, 2, 1).reshape(B, S_)  # noqa
        i_pos = jnp.broadcast_to(
            (jnp.arange(W64, dtype=jnp.int32) * 64)[None, :, None]
            + jnp.arange(64, dtype=jnp.int32)[None, None, :],
            (B, W64, 64)).reshape(B, S_)
        symidx = flat(rank_rows) + jnp.repeat(sstart, 64, axis=1)
        delta = jnp.where(flat(mk), i_pos - symidx, -1)
        rounds = int(S_ - 1).bit_length()
        return W.route_monotone_left([flat(A0), flat(P1)], delta, rounds)

    timeit("D route bit->symbol", stage_d, A0, P1, rank_rows, sstart,
           sums["Mlo"], sums["Mhi"])

    full = jax.jit(P(W.wave_decode, W64=W64))
    timeit("A-F wave_decode", full, nw, hsj, sizes, mdj)
    lw, r0, r1, nm, prod, e = full(nw, hsj, sizes, mdj)
    recs = WF.pack_fill_recs(r0, r1)
    timeit("G fill_matches", WF.fill_matches, lw, recs, nm, B)

    from deflate_tpu.models import wave_decoder as WD
    timeit("FUSED wave_decode_filled", WD.wave_decode_filled,
           nw, hsj, sizes, mdj, W64, B)

    @jax.jit
    def decode_then_stack(nw, hsj, sizes, mdj):
        lw, r0, r1, nm, prod, e = W.wave_decode(nw, hsj, sizes, mdj,
                                                W64=W64)
        recs = WF.pack_fill_recs(r0, r1)
        return lw, recs, nm, e
    timeit("A-F + stack (no fill)", decode_then_stack, nw, hsj, sizes,
           mdj)
    print(f"span max {int(span.max())} S={S_} B={B}")


if __name__ == "__main__":
    main()
