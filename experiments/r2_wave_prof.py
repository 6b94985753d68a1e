"""Wavefront decoder profiling on the real chip.

Encodes NB blocks per corpus with the device encoder, then times the
wavefront decode: host prep (header parse + window extraction) and the
device pipeline (wave_decode + fill_matches) separately.

    python experiments/r2_wave_prof.py [text|rep|rand|mixed ...] [NB]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from r2_decode_prof import corpus  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from deflate_tpu.models import encoder as E
    from deflate_tpu.models import wave_decoder as WD
    from deflate_tpu.ops import wave as W
    from deflate_tpu.ops import wave_fill as WF
    from deflate_tpu.runtime import stitch as S
    from deflate_tpu.utils.tables import BLOCK_SIZE

    args = [a for a in sys.argv[1:] if not a.isdigit()]
    nbs = [int(a) for a in sys.argv[1:] if a.isdigit()]
    kinds = args or ["text", "rep", "rand", "mixed"]
    NB = nbs[0] if nbs else 256
    rng = np.random.default_rng(7)
    nbytes = NB * BLOCK_SIZE

    @jax.jit
    def enc(blocks, blens, live):
        w, t, off, bits, hints = E.encode_batch_with_hints(
            blocks, blens, live, np.int32(NB - 1), 2, 0)
        return w, t, off, hints

    import zlib
    for kind in kinds:
        data = corpus(kind, nbytes, rng)
        buf = np.frombuffer(data, np.uint8)
        blocks = jnp.asarray(buf.reshape(NB, BLOCK_SIZE))
        blens = jnp.full((NB,), BLOCK_SIZE, jnp.int32)
        live = jnp.ones((NB,), bool)
        w, t, off, hints_d = enc(blocks, blens, live)
        stream = S.words_to_bytes(np.asarray(w), int(t))
        assert zlib.decompress(stream, -15) == data
        offs = np.asarray(off, np.int64)
        sizes = np.full(NB, BLOCK_SIZE, np.int64)

        # host prep timing (hints come from the encoder, not a walk)
        t0 = time.perf_counter()
        md = W.parse_headers_host(stream, offs)
        t_hdr = time.perf_counter() - t0
        t0 = time.perf_counter()
        hints = np.asarray(hints_d, np.uint8)
        t_walk = time.perf_counter() - t0

        # full-path correctness once
        got, err = WD.inflate_wave(stream, offs, sizes, hints)
        assert not err.any(), err
        assert got == data, "wave decode mismatch"

        # device-only timing: replay the bucketed calls
        next_off = np.append(offs[1:], 8 * len(stream))
        span = np.maximum(next_off - md["data_start"], 0)
        is_h = (md["btype"] != 0)
        hidx = np.nonzero(is_h)[0]
        need = -(-span[hidx] // 64)
        calls = []
        for W64 in WD.BUCKETS:
            lo = WD.BUCKETS[WD.BUCKETS.index(W64) - 1] \
                if W64 != WD.BUCKETS[0] else 0
            sel = hidx[(need <= W64) & (need > lo)]
            if not len(sel):
                continue
            nw = jnp.asarray(W.prepare_windows(
                stream, md["data_start"][sel], W64))
            hs = np.full((len(sel), W64), W.HINT_NONE, np.uint8)
            hav = min(W64, hints.shape[1])
            hs[:, :hav] = hints[sel][:, :hav]
            mdj = {k: jnp.asarray(v[sel]) for k, v in md.items()
                   if k.startswith(("l_", "d_"))}
            calls.append((nw, jnp.asarray(hs, jnp.int32),
                          jnp.asarray(sizes[sel], jnp.int32), mdj, W64,
                          len(sel)))

        def dstep():
            outs = []
            for nw, hs, sz, mdj, W64, n in calls:
                npad = -(-n // WF.K) * WF.K
                filled, prod, e = WD.wave_decode_filled(
                    nw, hs, sz, mdj, W64, npad)
                outs.append((filled, e))
            return outs

        if not calls:
            print(f"{kind:6s} ratio={len(stream)/nbytes:.3f} "
                  f"all-stored (no huffman blocks); hdr={t_hdr*1e3:.0f}ms",
                  flush=True)
            continue
        def syncv(outs):
            # device-side scalar reduce; pulling the 2 MB payload d2h
            # would time the tunnel, not the chip (CLAUDE.md)
            import jax.numpy as jnp
            return int(jnp.sum(outs[-1][0][:, 0]) + jnp.sum(outs[-1][1]))

        outs = dstep()
        syncv(outs)                           # warm + sync
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            outs = dstep()
        syncv(outs)
        dt = (time.perf_counter() - t0) / reps
        shapes = [(c[4], c[5]) for c in calls]
        print(f"{kind:6s} ratio={len(stream)/nbytes:.3f} "
              f"device={nbytes/dt/1e6:7.1f} MB/s ({dt*1e3:.1f} ms) "
              f"hdr={t_hdr*1e3:.0f}ms walk={t_walk*1e3:.0f}ms "
              f"buckets={shapes}", flush=True)


if __name__ == "__main__":
    main()
