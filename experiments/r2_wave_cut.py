"""In-graph cost attribution for wave_decode: time truncated pipelines."""
import sys, time, functools
import numpy as np
sys.path.insert(0, ".."); sys.path.insert(0, "experiments")
from r2_decode_prof import corpus

def main():
    import jax, jax.numpy as jnp
    from deflate_tpu.models import encoder as E
    from deflate_tpu.ops import wave as W
    from deflate_tpu.utils.tables import BLOCK_SIZE

    NB, kind, W64 = 64, "text", 2560
    rng = np.random.default_rng(7)
    data = corpus(kind, NB * BLOCK_SIZE, rng)
    buf = np.frombuffer(data, np.uint8)

    @jax.jit
    def enc(blocks):
        w, t, off, bits, hints = E.encode_batch_with_hints(
            blocks, jnp.full((NB,), BLOCK_SIZE, jnp.int32),
            jnp.ones((NB,), bool), np.int32(NB - 1), 2, 0)
        return w, t, off, hints
    from deflate_tpu.runtime import stitch as S
    w, t, off, hints_d = enc(jnp.asarray(buf.reshape(NB, BLOCK_SIZE)))
    stream = S.words_to_bytes(np.asarray(w), int(t))
    offs = np.asarray(off, np.int64)
    md = W.parse_headers_host(stream, offs)
    hints = np.asarray(hints_d, np.uint8)
    nw = jnp.asarray(W.prepare_windows(stream, md["data_start"], W64))
    hs = np.full((NB, W64), W.HINT_NONE, np.uint8)
    hs[:, :min(W64, hints.shape[1])] = hints[:, :W64]
    hsj = jnp.asarray(hs, jnp.int32)
    sizes = jnp.full((NB,), BLOCK_SIZE, jnp.int32)
    mdj = {k: jnp.asarray(v) for k, v in md.items()
           if k.startswith(("l_", "d_"))}

    B, S_ = NB, 64 * W64

    def cut(stage):
        @functools.partial(jax.jit, static_argnames=())
        def f(nw, hsj, sizes):
            A0, P1 = W.decode_positions(nw, mdj, W64)
            if stage == "A":
                return A0.sum() + P1.sum()
            sums, rank_rows = W.chunk_automaton(A0, hsj, W64)
            if stage == "B":
                return sum(v.sum() for v in sums.values()) + rank_rows.sum()
            sstart = jnp.cumsum(sums["sum_cnt"], axis=1) - sums["sum_cnt"]
            mk = W._unpack_marks(sums["Mlo"], sums["Mhi"], W64) > 0
            flat = lambda a: a.transpose(0, 2, 1).reshape(B, S_)  # noqa
            i_pos = jnp.broadcast_to(
                (jnp.arange(W64, dtype=jnp.int32) * 64)[None, :, None]
                + jnp.arange(64, dtype=jnp.int32)[None, None, :],
                (B, W64, 64)).reshape(B, S_)
            symidx = flat(rank_rows) + jnp.repeat(sstart, 64, axis=1)
            delta = jnp.where(flat(mk), i_pos - symidx, -1)
            rounds = int(S_ - 1).bit_length()
            (P0, P1f), dout = W.route_monotone_left(
                [flat(A0), flat(P1)], delta, rounds)
            if stage == "D":
                return P0.sum() + P1f.sum() + dout.sum()
            return P0.sum()
        return f

    for st in ("A", "B", "D"):
        f = cut(st)
        out = f(nw, hsj, sizes)
        int(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(nw, hsj, sizes)
        int(out)
        print(f"through {st}: {(time.perf_counter()-t0)/3*1e3:8.2f} ms",
              flush=True)

    full = jax.jit(functools.partial(W.wave_decode, W64=W64))
    out = full(nw, hsj, sizes, mdj)
    int(out[5].sum())
    t0 = time.perf_counter()
    for _ in range(3):
        out = full(nw, hsj, sizes, mdj)
    int(out[5].sum())
    print(f"through F: {(time.perf_counter()-t0)/3*1e3:8.2f} ms")

if __name__ == "__main__":
    main()
