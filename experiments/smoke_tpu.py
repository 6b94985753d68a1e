"""Real-TPU smoke: lower + RUN every Pallas kernel at production shapes.

Round-2 postmortem (VERDICT.md weak #1): a Pallas kernel that had only
ever executed under interpret=True became the wave-decoder default and
failed Mosaic lowering in the driver's bench.  Rule instituted here: no
Pallas kernel ships as a default without this script passing on the real
chip first.  Run it before any bench claim:

    python experiments/smoke_tpu.py

Exit code 0 = every kernel lowered, ran, and produced verified output.
Covers (at the production shapes the bench uses):
  - ops/pallas_tree.py   depths_batch           (encoder trees backend)
  - ops/pallas_pack.py   pack_blocks            (encoder pack backend)
  - ops/wave_stagea.py   decode_positions_pallas (wave stage A)
  - ops/wave_route.py    route_pallas           (wave stages D/E/F)
  - ops/wave_fill.py     fill_matches           (wave match fill)
  - ops/pallas_inflate.py inflate_stream        (foreign-stream decoder)
"""
from __future__ import annotations

import os
import sys
import time
import zlib

os.environ.setdefault("DT_STAGEA_PALLAS", "1")
os.environ.setdefault("DT_ROUTE_PALLAS", "1")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import numpy as np

T0 = time.perf_counter()
FAILED = []


def check(name, fn):
    t = time.perf_counter()
    try:
        fn()
        print(f"[smoke +{time.perf_counter() - T0:5.0f}s] PASS {name} "
              f"({time.perf_counter() - t:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001 - report every kernel
        FAILED.append(name)
        print(f"[smoke +{time.perf_counter() - T0:5.0f}s] FAIL {name}: "
              f"{type(e).__name__}: {e}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from deflate_tpu.models import encoder as E
    from deflate_tpu.models import wave_decoder as WD
    from deflate_tpu.runtime import stitch as S
    from deflate_tpu.utils.tables import BLOCK_SIZE

    plat = jax.devices()[0].platform
    print(f"[smoke] platform={plat}", flush=True)
    if plat not in ("tpu", "axon"):
        print("[smoke] WARNING: not a TPU — this run proves nothing "
              "about Mosaic lowering", flush=True)

    rng = np.random.default_rng(7)
    NB = 64                                   # production bucket size
    from bench import make_corpus
    corpus = make_corpus(rng, NB * BLOCK_SIZE)
    buf = np.frombuffer(corpus, np.uint8)
    blocks = jnp.asarray(buf.reshape(NB, BLOCK_SIZE))
    blens = jnp.full((NB,), BLOCK_SIZE, jnp.int32)
    live = jnp.ones((NB,), bool)

    state = {}

    def enc_kernel_backend():
        w, t, off, bits = jax.jit(
            E.encode_batch_with_offsets, static_argnums=(4,))(
            blocks, blens, live, np.int32(NB - 1), 2, 0)
        enc = S.words_to_bytes(np.asarray(w), int(t))
        assert zlib.decompress(enc, -15) == corpus, "roundtrip mismatch"
        state["enc"] = enc
        state["offs"] = np.asarray(off, np.int64)

    check("encoder pallas_pack+pallas_tree (L2, 64 blocks)",
          enc_kernel_backend)

    def wave():
        hints = np.asarray(jax.jit(
            E.encode_batch_with_hints, static_argnums=(4,))(
            blocks, blens, live, np.int32(NB - 1), 2, 0)[4], np.uint8)
        sizes = np.full(NB, BLOCK_SIZE, np.int64)
        got, derr = WD.inflate_wave(state["enc"], state["offs"],
                                    sizes, hints)
        assert not derr.any(), f"wave err flags: {derr.nonzero()}"
        assert got == corpus, "wave output mismatch"

    if "enc" in state:
        check("wave stagea+route+fill (64 blocks, hints)", wave)
    else:
        FAILED.append("wave (skipped: encode failed)")

    def planned_foreign():
        from deflate_tpu.models import wave_decoder as WD
        data = corpus[:3 * BLOCK_SIZE] + corpus[:BLOCK_SIZE // 2]
        ref = zlib.compress(data, 9)[2:-4]       # foreign stream
        plan = WD.skeleton_plan(ref)
        assert plan is not None, "native skeleton unavailable"
        out, derr = WD.inflate_wave_planned(ref, plan)
        assert out is not None and not derr.any(), f"err {derr}"
        assert out == data, "planned foreign decode mismatch"

    check("skeleton-planned foreign decode (wave + hist fill)",
          planned_foreign)

    def scalar_inflate():
        from deflate_tpu.models import pallas_decoder as PD
        # single-block foreign stream: the scalar kernel decodes blocks
        # standalone, so a multi-block zlib stream (whose matches cross
        # block boundaries) is out of contract here — the foreign-stream
        # path handles those with window carry at a higher level.
        raw = zlib.compress(corpus[:4096], 6)[2:-4]
        out = PD.inflate_stream(raw)
        assert out == corpus[:4096], "scalar inflate mismatch"

    check("pallas_inflate scalar decoder (foreign single-block stream)",
          scalar_inflate)

    if FAILED:
        print(f"[smoke] FAILED: {FAILED}", flush=True)
        sys.exit(1)
    print(f"[smoke] ALL PASS in {time.perf_counter() - T0:.0f}s",
          flush=True)


if __name__ == "__main__":
    main()
