"""Wavefront device decoder — batch driver for ops/wave.py.

Decodes B independent self-contained DEFLATE blocks (the encoder's
quirk-Q5 streams, reference deflate.hpp:697) on the TPU's vector units,
using per-chunk entry-phase hints carried by the manifest (or derived by
a host walk for hintless self-contained streams).

Responsibilities here: header parse (host), span bucketing (one compile
per bucket size, mirroring ops/pallas_inflate.prepare_blocks), stored
blocks (pure window copy — no wavefront needed), the stage-G match-fill
kernel, and reassembly to original block order.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from deflate_tpu.ops import wave as W
from deflate_tpu.ops import wave_fill as WF

import functools

import jax


@functools.partial(jax.jit, static_argnames=("W64", "npad", "interpret"))
def wave_decode_filled(nw, hints, sizes, mdj, W64: int, npad: int,
                       interpret: bool = False):
    """wave_decode + match fill in ONE jitted program — eager glue ops
    cost ~30 ms each on the axon tunnel (CLAUDE.md), so everything
    between the two kernels stays inside the jit."""
    n = nw.shape[0]
    litwords, rec0, rec1, nmatch, prod, e = W.wave_decode(
        nw, hints, sizes, mdj, W64, interpret)
    recs = jnp.stack([rec0, rec1], axis=2).reshape(n, 2 * W.NM)
    if npad != n:
        litwords = jnp.pad(litwords, ((0, npad - n), (0, 0)))
        recs = jnp.pad(recs, ((0, npad - n), (0, 0)))
        nmatch = jnp.pad(nmatch, (0, npad - n))
    filled = WF.fill_matches(litwords, recs, nmatch, npad,
                             interpret=interpret)
    return filled[:n], prod, e


BUCKETS = (512, 1024, 1536, 2048, 2560, 3072, 3584, 4224)   # W64 sizes
# (span/64, lane-aligned; fine steps — stage cost scales with the bucket)


def prepare_bucketed(stream: bytes, bit_offsets, out_sizes, hints=None):
    """Host prep shared by the driver and the benchmarks: header parse,
    stored/huffman split, span bucketing, window extraction.

    Returns (prep dict, calls) where each call is (sel, nw, hints, sizes,
    mdj, W64, npad) ready for wave_decode_filled."""
    bit_offsets = np.asarray(bit_offsets, np.int64)
    out_sizes = np.asarray(out_sizes, np.int64)
    B = len(bit_offsets)
    md = W.parse_headers_host(stream, bit_offsets)
    if hints is None:
        hints, _ = W.hints_from_walk_host(stream, bit_offsets)
    hints = np.asarray(hints, np.uint8)

    # span upper bound from the next block's offset (blocks are dense)
    next_off = np.append(bit_offsets[1:], 8 * len(stream))
    span = np.maximum(next_off - md["data_start"], 0)

    err = np.asarray(md["hdr_err"]).astype(np.int64).copy()
    is_stored = md["btype"] == 0
    sidx = np.nonzero(is_stored & ~md["hdr_err"])[0]
    stored_words = None
    if len(sidx):
        nw = W.prepare_windows(stream, md["data_start"][sidx], 4096)
        stored_words = nw[:, :WF.OW]
        err[sidx] |= (md["stored_len"][sidx] != out_sizes[sidx])

    hidx_all = np.nonzero(~is_stored & ~md["hdr_err"])[0]
    overflow = span[hidx_all] > 64 * BUCKETS[-1]
    err[hidx_all[overflow]] = 1
    hidx_all = hidx_all[~overflow]
    need = -(-span[hidx_all] // 64)
    calls = []
    for W64 in BUCKETS:
        sel = hidx_all[(need <= W64)
                       & (need > (BUCKETS[BUCKETS.index(W64) - 1]
                                  if W64 != BUCKETS[0] else 0))]
        if not len(sel):
            continue
        nw = W.prepare_windows(stream, md["data_start"][sel], W64)
        hsel = np.full((len(sel), W64), W.HINT_NONE, np.uint8)
        hav = min(W64, hints.shape[1])
        hsel[:, :hav] = hints[sel][:, :hav]
        mdj = {k: jnp.asarray(v[sel]) for k, v in md.items()
               if k.startswith(("l_", "d_"))}
        n = len(sel)
        npad = -(-n // WF.K) * WF.K            # fill kernel cell multiple
        calls.append((sel, jnp.asarray(nw),
                      jnp.asarray(hsel, jnp.int32),
                      jnp.asarray(out_sizes[sel], jnp.int32), mdj, W64,
                      npad))
    prep = {"B": B, "md": md, "err": err, "sidx": sidx,
            "stored_words": stored_words, "out_sizes": out_sizes}
    return prep, calls


def inflate_wave_device(stream: bytes, bit_offsets, out_sizes,
                        hints=None, interpret: bool = False):
    """Decode blocks on device; returns (words [B, 8192] jnp.int32 in
    original block order, produced np[B], err np[B]).

    bit_offsets: absolute bit of each block's BFINAL bit (manifest).
    out_sizes:   expected decoded size per block (manifest).
    hints:       [B, >=W64] uint8 per-chunk entry phases (manifest v2);
                 derived by a host walk when absent.
    """
    prep, calls = prepare_bucketed(stream, bit_offsets, out_sizes, hints)
    B, md, err = prep["B"], prep["md"], prep["err"]
    words = jnp.zeros((B, WF.OW), jnp.int32)
    produced = np.zeros(B, np.int64)
    if prep["stored_words"] is not None:
        words = words.at[prep["sidx"]].set(
            jnp.asarray(prep["stored_words"]))
        produced[prep["sidx"]] = md["stored_len"][prep["sidx"]]
    for sel, nw, hsel, sizes, mdj, W64, npad in calls:
        filled, prod, e = wave_decode_filled(
            nw, hsel, sizes, mdj, W64, npad, interpret)
        words = words.at[sel].set(filled)
        produced[sel] = np.asarray(prod)
        err[sel] |= np.asarray(e).astype(np.int64)
    return words, produced, err


def inflate_wave(stream: bytes, bit_offsets, out_sizes, hints=None,
                 interpret: bool = False) -> tuple[bytes, np.ndarray]:
    """Host-assembled convenience wrapper; returns (bytes, err[B])."""
    words, produced, err = inflate_wave_device(
        stream, bit_offsets, out_sizes, hints, interpret)
    w = np.asarray(words).view(np.uint8).reshape(len(produced), -1)
    out = b"".join(w[b, :produced[b]].tobytes()
                   for b in range(len(produced)))
    return out, err
