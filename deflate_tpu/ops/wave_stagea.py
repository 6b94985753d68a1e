"""Pallas kernel for wavefront stage A (per-bit-position decode).

The XLA formulation (wave.decode_positions) materializes the [B, 64,
W64] peek windows and the compare rounds' intermediates through HBM —
~14 ms of the 64-block text decode budget for ~2 ns/position against a
~0.6 ns/position fused-VPU floor (CLAUDE.md cost model).  Here a
(block, column-tile) grid builds the peeks in VMEM with per-row funnel
shifts (row p of a tile = bit phase p) and runs the entire 15+15-round
canonical decode (wave.decode_core) without leaving VMEM; HBM sees only
the window words in and the packed A0/P1 out.

Per-block canonical-decode scalars (first/lim per code length, class
boundaries, membership masks) ride SMEM as one stacked [7, 16] int32
table read by decode_core's getter.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deflate_tpu.ops import wave as W

MD_KEYS = ("l_lim", "l_first", "l_meta", "l_mask",
           "d_lim", "d_first", "d_mask")


def stack_md(md) -> jax.Array:
    """Stack the decode_core scalar tables into one [B, 7, 16] int32
    array for the kernel's SMEM operand (all entries fit int32: limits/
    first codes <= 2^15, membership masks <= 30 bits)."""
    return jnp.stack([md[k].astype(jnp.int32) for k in MD_KEYS], axis=1)


def _build_peeks_tile(we, wo, w2, w3, TW: int):
    """Peek windows for one column tile: PK, PKH each [64, TW]."""
    srl = jax.lax.shift_right_logical
    p = jax.lax.broadcasted_iota(jnp.int32, (64, TW), 0)
    pm = p & 31
    sel = p >= 32
    b0 = jnp.where(sel, wo, we)
    b1 = jnp.where(sel, w2, wo)
    b2 = jnp.where(sel, w3, w2)
    pmc = jnp.where(pm == 0, 1, pm)          # keep shifts in 1..31
    PK = jnp.where(pm == 0, b0, srl(b0, pmc) | (b1 << (32 - pmc)))
    PKH = jnp.where(pm == 0, b1, srl(b1, pmc) | (b2 << (32 - pmc)))
    return PK, PKH


def _kernel(we_ref, wo_ref, w2_ref, w3_ref, md_ref, a0_ref, p1_ref,
            *, TW: int):
    we, wo = we_ref[0], wo_ref[0]          # [1, TW] each
    w2, w3 = w2_ref[0], w3_ref[0]
    PK, PKH = _build_peeks_tile(we, wo, w2, w3, TW)

    ki = {k: i for i, k in enumerate(MD_KEYS)}

    def g(key, l):
        return md_ref[0, ki[key], l]

    A0, P1 = W.decode_core(PK, PKH, g)
    a0_ref[0] = A0
    p1_ref[0] = P1


SUM_KEYS = ("Mlo", "Mhi", "Clo", "Chi", "sum_emit", "sum_cnt",
            "sum_match", "sum_eob", "sum_inv")


def _kernel_ab(we_ref, wo_ref, w2_ref, w3_ref, h_ref, md_ref,
               a0_ref, p1_ref, sm_ref, *, TW: int, maxl: int = 15,
               maxd: int = 15):
    """Fused stages A+B+chunk-compaction: per-bit-position decode, the
    64-step chunk mark automaton, AND the within-chunk symbol
    compaction (wave.chunk_compact's 6 monotone roll rounds, here as
    full-tile pltpu.rolls along the phase axis) — A0/P1 never leave
    VMEM between the stages, and HBM receives only the COMPACTED
    [CCAP, W64] symbol rows instead of three full [64, W64] arrays
    (6x less output traffic; the downstream bit->symbol route then runs
    at W64*CCAP lanes).  Chunks are hint-seeded and therefore
    independent, so everything tiles on the same (block, column-tile)
    grid (wave.chunk_automaton + wave.chunk_compact are the XLA
    reference; differential-tested).  A chunk with more than CCAP
    symbol starts (needs ~1-3-bit code lengths) loses the overflow
    ranks to the [:CCAP] slice; wave_decode flags sum_cnt > CCAP as a
    per-block error and callers fall back.
    """
    srl = jax.lax.shift_right_logical
    i32 = jnp.int32
    we, wo = we_ref[0], wo_ref[0]
    w2, w3 = w2_ref[0], w3_ref[0]
    PK, PKH = _build_peeks_tile(we, wo, w2, w3, TW)

    ki = {k: i for i, k in enumerate(MD_KEYS)}

    def g(key, l):
        return md_ref[0, ki[key], l]

    A0, P1 = W.decode_core(PK, PKH, g, maxl, maxd)

    # synthetic stop (skeleton-cut virtual blocks): override the decode
    # at exactly stop_bit with an EOB record (advance 1, emit 0, cls 2).
    # stop rides row 7 of the md SMEM table (a dedicated (1, 1) SMEM
    # block would violate the Mosaic tiling rule — caught by the
    # real-TPU smoke, the round-2 lesson).
    j = pl.program_id(1)
    col = jax.lax.broadcasted_iota(i32, (64, TW), 1) + j * TW
    row = jax.lax.broadcasted_iota(i32, (64, TW), 0)
    pos = col * 64 + row
    A0 = jnp.where(pos == md_ref[0, len(MD_KEYS), 0], 1 | (2 << 15), A0)

    # ---- chunk automaton (wave.chunk_automaton, [TW]-lane form) ------
    # The 64-step mark chain is inherently sequential, but only the
    # mark/carry propagation must run per step ([1, TW] rows idle 7 of
    # 8 sublanes): the per-row field extraction is hoisted to full-tile
    # ops before the loop, and every accumulation (sums, ranks) becomes
    # a full-tile reduction over the mark matrix after it.
    ADV = A0 & 63                                  # [64, TW] full-tile
    EMIT = srl(A0, 6) & 511
    CLS = srl(A0, 15) & 3
    NOSTOP = (CLS < 2).astype(i32)
    NT = row + ADV
    B0 = (NT < 32).astype(i32)
    B1 = ((NT >= 32) & (NT < 64)).astype(i32)
    B2 = ((NT >= 64) & (NT < 96)).astype(i32)
    B3 = (NT >= 96).astype(i32)
    S0 = jnp.clip(NT, 0, 31)
    S1 = jnp.clip(NT - 32, 0, 31)
    S2 = jnp.clip(NT - 64, 0, 31)
    S3 = jnp.clip(NT - 96, 0, 31)

    h = h_ref[0]                                   # [1, TW]
    z = jnp.zeros((1, TW), i32)
    Mlo = jnp.where(h < 32, 1 << jnp.clip(h, 0, 31), 0)
    Mhi = jnp.where((h >= 32) & (h < 64), 1 << jnp.clip(h - 32, 0, 31), 0)
    Clo = Chi = z
    mark_rows = []
    for t in range(64):
        bit = (srl(Mlo, t) if t < 32 else srl(Mhi, t - 32)) & 1
        mark_rows.append(bit)
        live = bit * NOSTOP[t:t + 1]
        if t < 31:
            Mlo = Mlo | (B0[t:t + 1] * (live << S0[t:t + 1]))
        Mhi = Mhi | (B1[t:t + 1] * (live << S1[t:t + 1]))
        Clo = Clo | (B2[t:t + 1] * (live << S2[t:t + 1]))
        Chi = Chi | (B3[t:t + 1] * (live << S3[t:t + 1]))

    MK = jnp.concatenate(mark_rows, axis=0)        # [64, TW] marks
    se = jnp.sum(MK * EMIT, axis=0, keepdims=True)
    sc = jnp.sum(MK, axis=0, keepdims=True)
    sm = jnp.sum(MK * (CLS == 1), axis=0, keepdims=True)
    sb = jnp.sum(MK * (CLS == 2), axis=0, keepdims=True)
    si = jnp.sum(MK * (CLS == 3), axis=0, keepdims=True)
    sm_ref[0] = jnp.concatenate(
        [Mlo, Mhi, Clo, Chi, se, sc, sm, sb, si], axis=0)

    # ---- within-chunk compaction: 6 monotone roll rounds along the
    # phase axis (wave.chunk_compact semantics) on full [64, TW] tiles —
    # a per-rank select-accumulate here measured 2x slower (r4): its
    # [1, TW] rows idle 7 of 8 sublanes.
    # (rank = exclusive cumsum of MK down the phase axis, via 6
    # log-shift rounds — Mosaic has no cumsum primitive, caught by the
    # real-TPU bench leg, the round-2 lesson again)
    acc = MK
    for k in range(6):
        s = 1 << k
        acc = acc + jnp.where(row >= s, pltpu.roll(acc, s, axis=0), 0)
    rank = acc - MK                                # [64, TW] full-tile
    d = jnp.where(MK > 0, row - rank, -1)
    a_c, p_c = A0, P1
    for k in range(6):
        s = 1 << k
        edge = row >= 64 - s
        ds = jnp.where(edge, -1, pltpu.roll(d, 64 - s, axis=0))
        inc = (ds >= 0) & (((ds >> k) & 1) > 0)
        out = (d >= 0) & (((d >> k) & 1) > 0)
        a_c = jnp.where(inc, pltpu.roll(a_c, 64 - s, axis=0), a_c)
        p_c = jnp.where(inc, pltpu.roll(p_c, 64 - s, axis=0), p_c)
        d = jnp.where(inc, ds - s, jnp.where(out, -1, d))
    a0_ref[0] = a_c[:W.CCAP]
    p1_ref[0] = p_c[:W.CCAP]


@functools.partial(jax.jit, static_argnames=("W64", "interpret",
                                             "maxl", "maxd"))
def decode_mark_pallas(nwords, hints, md, W64: int, stop_bit=None,
                       interpret: bool = False, maxl: int = 15,
                       maxd: int = 15):
    """Fused stage A+B+compaction: returns (A0c, P1c each
    [B, CCAP, W64] — chunk w's rank-j symbol record at [b, j, w] — and
    sums dict of [B, W64]).  Drop-in for decode_positions +
    chunk_automaton + chunk_compact (with the stop_bit override applied
    in between)."""
    B = nwords.shape[0]
    TW = next(t for t in (512, 256, 128) if W64 % t == 0)
    we = nwords[:, 0:2 * W64:2][:, None, :]
    wo = nwords[:, 1:2 * W64 + 1:2][:, None, :]
    w2 = nwords[:, 2:2 * W64 + 2:2][:, None, :]
    w3 = nwords[:, 3:2 * W64 + 3:2][:, None, :]
    hr = hints.astype(jnp.int32)[:, None, :]
    # md rows 0..6 + stop_bit in row 7 col 0 (one SMEM operand — a
    # standalone (1, 1) SMEM block fails the Mosaic tiling rule)
    if stop_bit is None:
        stop = jnp.full((B,), -1, jnp.int32)
    else:
        stop = stop_bit.astype(jnp.int32).reshape(B)
    srow = jnp.zeros((B, 1, 16), jnp.int32).at[:, 0, 0].set(stop)
    mds = jnp.concatenate([stack_md(md), srow], axis=1)

    ws = pl.BlockSpec((1, 1, TW), lambda b, j: (b, 0, j),
                      memory_space=pltpu.VMEM)
    ms = pl.BlockSpec((1, len(MD_KEYS) + 1, 16), lambda b, j: (b, 0, 0),
                      memory_space=pltpu.SMEM)
    os_ = pl.BlockSpec((1, W.CCAP, TW), lambda b, j: (b, 0, j),
                       memory_space=pltpu.VMEM)
    sms = pl.BlockSpec((1, len(SUM_KEYS), TW), lambda b, j: (b, 0, j),
                       memory_space=pltpu.VMEM)
    A0c, P1c, sm = pl.pallas_call(
        functools.partial(_kernel_ab, TW=TW, maxl=maxl, maxd=maxd),
        grid=(B, W64 // TW),
        in_specs=[ws, ws, ws, ws, ws, ms],
        out_specs=[os_, os_, sms],
        out_shape=[jax.ShapeDtypeStruct((B, W.CCAP, W64), jnp.int32)] * 2
        + [jax.ShapeDtypeStruct((B, len(SUM_KEYS), W64), jnp.int32)],
        interpret=interpret,
    )(we, wo, w2, w3, hr, mds)
    sums = {k: sm[:, i] for i, k in enumerate(SUM_KEYS)}
    return A0c, P1c, sums


@functools.partial(jax.jit, static_argnames=("W64", "interpret"))
def decode_positions_pallas(nwords, md, W64: int,
                            interpret: bool = False):
    """Drop-in for wave.decode_positions: A0, P1 each [B, 64, W64]."""
    B = nwords.shape[0]
    TW = next(t for t in (512, 256, 128) if W64 % t == 0)
    # Inputs carried as [B, 1, W64]: Mosaic requires each block's last
    # two dims be (mult of 8, mult of 128) OR equal to the array dims —
    # a (1, 1, TW) block over [B, 1, W64] satisfies it (1 == 1, TW%128
    # == 0), whereas a (1, TW) block over [B, W64] does not for B > 1.
    we = nwords[:, 0:2 * W64:2][:, None, :]
    wo = nwords[:, 1:2 * W64 + 1:2][:, None, :]
    w2 = nwords[:, 2:2 * W64 + 2:2][:, None, :]
    w3 = nwords[:, 3:2 * W64 + 3:2][:, None, :]
    mds = stack_md(md)

    ws = pl.BlockSpec((1, 1, TW), lambda b, j: (b, 0, j),
                      memory_space=pltpu.VMEM)
    ms = pl.BlockSpec((1, len(MD_KEYS), 16), lambda b, j: (b, 0, 0),
                      memory_space=pltpu.SMEM)
    os_ = pl.BlockSpec((1, 64, TW), lambda b, j: (b, 0, j),
                       memory_space=pltpu.VMEM)
    A0, P1 = pl.pallas_call(
        functools.partial(_kernel, TW=TW),
        grid=(B, W64 // TW),
        in_specs=[ws, ws, ws, ws, ms],
        out_specs=[os_, os_],
        out_shape=[jax.ShapeDtypeStruct((B, 64, W64), jnp.int32)] * 2,
        interpret=interpret,
    )(we, wo, w2, w3, mds)
    return A0, P1
