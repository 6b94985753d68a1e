"""Stage G of the wavefront decoder: LZ match fill on the scalar core.

After ops/wave.py places literal bytes and compacts per-block match
records (opos | (len-3)<<16, dist), this kernel performs the only
inherently sequential step — copying match bytes, which may reference
bytes produced by earlier matches (reference analog: the backref copy
loop at inflate.hpp:284-305).

Throughput structure (measured on v5e):
  * a single SMEM-destined DMA runs at only ~0.6 GB/s, but CONCURRENT
    DMA channels overlap (~3+ GB/s aggregate, cf. ops/pallas_inflate's
    4-chain cells) — so each grid cell handles K blocks and issues all
    2K input DMAs together, then all K output DMAs;
  * the scalar core is ops-bound (~2 cycles/op; interleaving does not
    help — CLAUDE.md cost model), so the record loop is shaped around
    op count in the COMMON case: matches with len <= 8 and dist >= 8
    (the bulk of a greedy parse) take ONE fused 3-word masked write —
    source read, mask build, and destination RMW all straight-line,
    no inner loop, no overlap handling;
  * longer matches take a word-run path (one whole-word store per
    iteration); dist < 8 overlap cases take a byte-masked general
    path with RFC pattern promotion (dist 1/2/3 are periodic fills).

Records are interleaved [B, 2*NM] (rec0, rec1 pairs); NM is a multiple
of 1024 so DMA source offsets stay Mosaic-tile aligned.  Only the first
RW records per block ride the batched DMA; rare overflow windows
(> RW matches) are fetched synchronously.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deflate_tpu.ops.wave import NM, ND

import os

OW = ND // 4                 # output words per block
RW = 1024                    # match records per SMEM window
K = int(os.environ.get("DT_FILL_K", "8"))  # blocks/cell (concurrent DMAs)
# slot strides 1024-word aligned (Mosaic DMA tiling); OWP's +1024 pad
# also absorbs the 3-word RMW one-past-the-end touch
OWP = OW + 1024
RECP = 2 * RW

i32 = jnp.int32


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


def pack_fill_recs(rec0, rec1):
    """VPU prologue for fill_matches: pre-classify each match record and
    pack class-specific fields so the scalar core's per-record decode is
    minimal (measured ~70 cycles/record in r4; every saved scalar op is
    ~2 cycles across thousands of records per block).

    Input: rec0 [B, NM] = opos | len3<<16, rec1 [B, NM] = dist (the
    wave_decode/merge_match_runs format).  Output: interleaved
    [B, 2*NM] int32 in the packed layout _fill_block(pre=True) reads:

      r0 = opos(15) | tiny<<15 | field(15)<<16 | short<<31
           tiny  (len<=4 & dist>=4):          field bit0 = (len == 4)
           short (len<=8 & dist>=8, !tiny):   field = len3
           general (everything else):         field = len3
      r1 = max(opos - dist, 0)  — the source byte position, clamped so
           SMEM reads stay in-bounds even for invalid streams (the wave
           chain validation flags those and the host falls back; the
           kernel just has to stay memory-safe).  The general path
           recovers dist = opos - r1, exact whenever dist <= opos —
           always true for conforming self-contained blocks (quirk Q5).

    opos <= 32767 and len3 <= 32765 (block output is 32 KiB), so both
    15-bit fields fit.  Hole records (rec0 == -1) pack to junk but sit
    past nmatch after merge_match_runs' compaction and are never read.
    """
    p = rec0 & 0xFFFF
    len3 = _srl(rec0, 16)
    rem = len3 + 3
    dist = rec1
    tiny = (rem <= 4) & (dist >= 4)
    short = (rem <= 8) & (dist >= 8) & ~tiny
    fld = jnp.where(tiny, (rem >= 4).astype(i32), len3 & 0x7FFF)
    r0 = ((p & 0x7FFF) | (tiny.astype(i32) << 15) | (fld << 16)
          | (short.astype(i32) << 31))
    r1 = jnp.maximum(p - dist, 0)
    return jnp.stack([r0, r1], axis=2).reshape(rec0.shape[0], -1)


def _fill_block(mem, sb: "jax.Array", recs, rb, nm, p0,
                fetch_window, pre: bool = False) -> None:
    """Fill one block's matches into mem[sb + ...] (SMEM scratch).

    mem:   SMEM ref holding this block's output bytes (word-packed,
           little-endian) at word offset sb; match positions are bytes
           relative to 4*sb + p0 (p0 > 0 for the history variant).
    recs:  SMEM ref of the current record window (RW records).
    rb:    word offset of this block's window inside recs.
    nm:    record count.
    fetch_window(wi): DMA window wi of records into recs[rb:] (wi >= 1;
           window 0 is pre-loaded by the caller's batched DMA).
    """

    def funnel(p):
        """8 source bytes starting at byte p, as two words."""
        wi = _srl(p, 2)
        sh = (p & 3) * 8
        a = mem[sb + wi]
        b = mem[sb + wi + 1]
        c = mem[sb + wi + 2]
        v0 = jnp.where(sh == 0, a, _srl(a, sh) | (b << (32 - sh)))
        v1 = jnp.where(sh == 0, b, _srl(b, sh) | (c << (32 - sh)))
        return v0, v1

    def funnel1(p):
        wi = _srl(p, 2)
        sh = (p & 3) * 8
        a = mem[sb + wi]
        b = mem[sb + wi + 1]
        return jnp.where(sh == 0, a, _srl(a, sh) | (b << (32 - sh)))

    def wr8(p, v0, v1, m0, m1):
        """Masked write of 8 bytes (v0,v1 under m0,m1) at byte p —
        one fused 3-word RMW; the third word's RMW is skipped when its
        mask is empty (every aligned p, ~60%+ of short matches)."""
        wi = _srl(p, 2)
        sh = (p & 3) * 8
        ns = 32 - jnp.maximum(sh, 1)
        ma = m0 << sh
        va = v0 << sh
        mb = jnp.where(sh == 0, m1, _srl(m0, ns) | (m1 << sh))
        vb = jnp.where(sh == 0, v1, _srl(v0, ns) | (v1 << sh))
        mc = jnp.where(sh == 0, i32(0), _srl(m1, ns))
        a = mem[sb + wi]
        mem[sb + wi] = (a & ~ma) | (va & ma)
        b = mem[sb + wi + 1]
        mem[sb + wi + 1] = (b & ~mb) | (vb & mb)

        @pl.when(mc != 0)
        def _():
            vc = _srl(v1, ns)
            c = mem[sb + wi + 2]
            mem[sb + wi + 2] = (c & ~mc) | (vc & mc)

    def wr4(p, w, m):
        """Masked write of one 4-byte group at byte p; the second
        word's RMW is skipped when the group fits the first (about
        half of length-3/4 matches)."""
        wi = _srl(p, 2)
        sh = (p & 3) * 8
        ma = m << sh
        va = w << sh
        a = mem[sb + wi]
        mem[sb + wi] = (a & ~ma) | (va & ma)
        mb = jnp.where(sh == 0, i32(0), _srl(m, 32 - jnp.maximum(sh, 1)))

        @pl.when(mb != 0)
        def _():
            vb = _srl(w, 32 - jnp.maximum(sh, 1))
            b = mem[sb + wi + 1]
            mem[sb + wi + 1] = (b & ~mb) | (vb & mb)

    def masks(eff):
        """Byte masks for the first min(eff, 8) bytes as two words."""
        m0 = jnp.where(eff >= 4, i32(-1), (i32(1) << (8 * eff)) - 1)
        m1 = jnp.where(eff <= 4, i32(0),
                       jnp.where(eff >= 8, i32(-1),
                                 (i32(1) << (8 * (eff - 4))) - 1))
        return m0, m1

    def rot3(w):
        return _srl(w, 8) | ((_srl(w, 8) & 0xFF) << 24)

    # ---- common case: len <= 8, dist >= 8: one fused masked write ----
    def fused8(a):
        p, rem, dist = a
        v0, v1 = funnel(jnp.maximum(p - dist, 0))
        m0, m1 = masks(rem)
        wr8(p, v0, v1, m0, m1)

    # ---- commonest case: len 3..4, dist >= 4: one 2-word RMW ---------
    # (about half of a text parse's matches are minimum-length; skipping
    # the second funnel word + second mask + third RMW cuts the record's
    # scalar op count ~40%)
    def fused4(a):
        p, rem, dist = a
        v0 = funnel1(jnp.maximum(p - dist, 0))
        wr4(p, v0, jnp.where(rem >= 4, i32(-1), i32(0xFFFFFF)))

    # ---- general case: overlap patterns + word runs -------------------
    def slow_step(a):
        # byte-masked 8-byte group write (short overlapped matches /
        # tails); straight-line — measured faster than branching the
        # pattern work out on the scalar core
        p, rem, dist, done = a
        eff = jnp.minimum(rem, i32(8))
        w0 = funnel1(jnp.maximum(p - dist, 0))
        bb = w0 & 0xFF
        rep1 = bb | (bb << 8) | (bb << 16) | (bb << 24)
        hh = w0 & 0xFFFF
        patw = jnp.where(
            dist == 1, rep1,
            jnp.where(dist == 2, hh | (hh << 16),
                      (w0 & 0xFFFFFF) | (bb << 24)))
        v0 = jnp.where(dist < 4, patw, w0)
        m0, m1 = masks(eff)
        # first group write, then re-read for the second group
        # (correct for 4<=dist<8 overlap); dist<4 uses patterns
        wr4(p, v0, m0)
        w1f = funnel1(jnp.maximum(p + 4 - dist, 0))
        v1 = jnp.where(dist == 3, rot3(patw),
                       jnp.where(dist < 4, patw, w1f))
        wr4(p + 4, v1, m1)
        return p + eff, rem - eff, done + eff

    def fast_run(a):
        # word-run path for long matches: align to a word boundary,
        # then one whole-word store per iteration.  dist < 4 is
        # PROMOTED to a multiple >= 25 (the filled region is
        # dist-periodic, so out[p-k*dist] == out[p-dist] once >= 28
        # bytes of THIS match are written — the periodicity chain must
        # not step past the match start); sources then always sit >= 4
        # bytes behind the write cursor, which makes sequential word
        # fill safe for every RFC overlap case.
        p, rem, dist, done = a
        kd = jnp.where(dist >= 4, dist,
                       jnp.where(dist == 1, 28,
                                 jnp.where(dist == 2, 28, 27)))
        hb = jnp.minimum((4 - (p & 3)) & 3, rem)
        hw = funnel1(jnp.maximum(p - kd, 0))
        hm = jnp.where(hb == 0, i32(0), (i32(1) << (8 * hb)) - 1)
        wr4(p, hw, hm)
        p = p + hb
        rem = rem - hb
        full = _srl(rem, 2)

        def wbody(s):
            w, ps, k = s
            mem[sb + w] = funnel1(ps)
            return w + 1, ps + 4, k + 1

        jax.lax.while_loop(
            lambda s: s[2] < full, wbody,
            (_srl(p, 2), jnp.maximum(p - kd, 0), i32(0)))
        adv = 4 * full
        return p + adv, rem - adv, done + hb + adv

    def general(a):
        def body(c):
            p, rem, dist, done = c
            use_fast = (rem >= 16) & ((dist >= 4) | (done >= 28))
            p, rem, done = jax.lax.cond(
                use_fast, fast_run, slow_step, (p, rem, dist, done))
            return p, rem, dist, done

        p, rem, dist = a
        jax.lax.while_loop(lambda c: c[1] > 0, body,
                           (p, rem, dist, i32(0)))

    def do_window(wi, _):
        # window 0 rode the batched DMA; later windows synchronous
        @pl.when(wi > 0)
        def _():
            fetch_window(wi)
        lim = jnp.minimum(nm - wi * RW, RW)

        if pre:
            # packed pack_fill_recs layout: class bits + clamped source
            # position precomputed on the VPU — the scalar core only
            # tests single bits and never touches max()/dist compares
            def rec_body(mi):
                r0 = recs[rb + 2 * mi]
                r1 = recs[rb + 2 * mi + 1]
                p = r0 & 0x7FFF

                def tiny_fn(_):
                    v0 = funnel1(r1)
                    wr4(p, v0, jnp.where((r0 & 0x10000) != 0,
                                         i32(-1), i32(0xFFFFFF)))

                def not_tiny(_):
                    rem = (_srl(r0, 16) & 0x7FFF) + 3

                    def short_fn(_):
                        # short => rem in 5..8, so m0 is always -1
                        v0, v1 = funnel(r1)
                        m1 = jnp.where(rem >= 8, i32(-1),
                                       (i32(1) << (8 * (rem - 4))) - 1)
                        wr8(p, v0, v1, i32(-1), m1)

                    def gen_fn(_):
                        general((p, rem, p - r1))

                    jax.lax.cond(r0 < 0, short_fn, gen_fn, 0)

                jax.lax.cond((r0 & 0x8000) != 0, tiny_fn, not_tiny, 0)
        else:
            def rec_body(mi):
                r0 = recs[rb + 2 * mi]
                r1 = recs[rb + 2 * mi + 1]
                p = (r0 & 0xFFFF) + p0
                # len3 is 16 bits: wave.merge_match_runs fuses
                # same-distance chains into run records
                rem = (_srl(r0, 16) & 0xFFFF) + 3
                dist = r1
                tiny = (rem <= 4) & (dist >= 4)
                short = (rem <= 8) & (dist >= 8)

                def not_tiny(a):
                    jax.lax.cond(short, fused8, general, a)

                jax.lax.cond(tiny, fused4, not_tiny, (p, rem, dist))

        # two records per loop iteration: halves the while-loop
        # counter/compare/branch overhead per record
        def pair_body(mj, _):
            rec_body(2 * mj)
            rec_body(2 * mj + 1)
            return 0

        jax.lax.fori_loop(0, _srl(lim, 1), pair_body, 0)

        @pl.when((lim & 1) != 0)
        def _():
            rec_body(lim - 1)
        return 0

    jax.lax.fori_loop(0, (nm + RW - 1) // RW, do_window, 0)


def _kernel(nm_ref, lit_ref, rec_ref, out_ref, outw, recs,
            sems_lit, sems_rec, sems_out):
    g = pl.program_id(0)

    # ---- all input DMAs for the cell's K blocks, concurrently --------
    cps = []
    for j in range(K):
        cps.append(pltpu.make_async_copy(
            lit_ref.at[pl.ds((g * K + j) * OW, OW)],
            outw.at[pl.ds(j * OWP, OW)], sems_lit.at[j]))
        cps.append(pltpu.make_async_copy(
            rec_ref.at[pl.ds((g * K + j) * 2 * NM, 2 * RW)],
            recs.at[pl.ds(j * RECP, 2 * RW)], sems_rec.at[j]))
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    # ---- per-block fill ----------------------------------------------
    for j in range(K):
        def fetch_window(wi, j=j):
            pltpu.make_async_copy(
                rec_ref.at[pl.ds((g * K + j) * 2 * NM + wi * 2 * RW,
                                 2 * RW)],
                recs.at[pl.ds(j * RECP, 2 * RW)], sems_rec.at[j]).start()
            pltpu.make_async_copy(
                rec_ref.at[pl.ds((g * K + j) * 2 * NM + wi * 2 * RW,
                                 2 * RW)],
                recs.at[pl.ds(j * RECP, 2 * RW)], sems_rec.at[j]).wait()

        _fill_block(outw, i32(j * OWP), recs, i32(j * RECP),
                    nm_ref[g * K + j], i32(0), fetch_window, pre=True)

    cps_out = []
    for j in range(K):
        cp = pltpu.make_async_copy(
            outw.at[pl.ds(j * OWP, OW)],
            out_ref.at[pl.ds((g * K + j) * OW, OW)], sems_out.at[j])
        cp.start()
        cps_out.append(cp)
    for cp in cps_out:
        cp.wait()


HW = OW                      # history words (32 KiB window, RFC 1951 max)
WIN = HW + OW + 64           # window scratch words (+pad for RMW tail)


def _kernel_seq(nm_ref, sz_ref, lit_ref, rec_ref, out_ref, window, recs,
                sem_lit, sem_rec, sem_out):
    """Ordered match fill with 32 KiB cross-block history — one virtual
    block per grid step (foreign-stream plans, dt_skeleton).

    A virtual block's matches may reference output produced by EARLIER
    virtual blocks (zlib emits cross-block references freely; reference
    analog inflate.hpp:284-305 with its persistent window).  The SMEM
    window holds [last 32 KiB of output | current block]: byte 32768 of
    the window IS the block's first output byte, so record positions and
    history reads share one linear address space with no wraparound.
    After each block a funnel-shift compaction slides the window left by
    the block's output length (out_len is byte-, not word-, granular).
    Grid steps execute sequentially on the core, which is exactly the
    dependency order the format imposes.
    """
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        def z(i, _):
            window[i] = 0
            return 0
        jax.lax.fori_loop(0, HW, z, 0)

    cp_lit = pltpu.make_async_copy(
        lit_ref.at[pl.ds(g * OW, OW)], window.at[pl.ds(HW, OW)], sem_lit)
    cp_rec = pltpu.make_async_copy(
        rec_ref.at[pl.ds(g * 2 * NM, 2 * RW)],
        recs.at[pl.ds(0, 2 * RW)], sem_rec)
    cp_lit.start()
    cp_rec.start()
    cp_lit.wait()
    cp_rec.wait()

    def fetch_window(wi):
        pltpu.make_async_copy(
            rec_ref.at[pl.ds(g * 2 * NM + wi * 2 * RW, 2 * RW)],
            recs.at[pl.ds(0, 2 * RW)], sem_rec).start()
        pltpu.make_async_copy(
            rec_ref.at[pl.ds(g * 2 * NM + wi * 2 * RW, 2 * RW)],
            recs.at[pl.ds(0, 2 * RW)], sem_rec).wait()

    _fill_block(window, i32(0), recs, i32(0), nm_ref[g], i32(4 * HW),
                fetch_window)

    cp_out = pltpu.make_async_copy(
        window.at[pl.ds(HW, OW)], out_ref.at[pl.ds(g * OW, OW)], sem_out)
    cp_out.start()

    # compaction: slide the window left by out_len BYTES so the history
    # region again holds the last 32 KiB of output.  Writes [0, HW) only
    # — disjoint from the in-flight output DMA's read of [HW, HW+OW).
    shift = sz_ref[g]
    w0 = _srl(shift, 2)
    sh = (shift & 3) * 8

    def comp(i, _):
        a = window[w0 + i]
        b = window[w0 + i + 1]
        window[i] = jnp.where(sh == 0, a, _srl(a, sh) | (b << (32 - sh)))
        return 0

    jax.lax.fori_loop(0, HW, comp, 0)
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("B", "interpret"))
def fill_matches_hist(litwords, recs, nmatch, sizes, B: int,
                      interpret: bool = False):
    """fill_matches for ORDERED virtual blocks with 32 KiB cross-block
    history (foreign-stream skeleton plans).  litwords [B, OW] int32 in
    stream order, recs [B, 2*NM] interleaved, nmatch [B], sizes [B]
    output bytes per block.  Returns [B, OW] (block b's output bytes at
    row b, valid up to sizes[b])."""
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.SMEM((WIN,), jnp.int32),
            pltpu.SMEM((RECP,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _kernel_seq,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((B * OW,), jnp.int32),
        interpret=interpret,
    )(nmatch, sizes.astype(jnp.int32), litwords.reshape(-1),
      recs.reshape(-1))
    return out.reshape(B, OW)


@functools.partial(jax.jit, static_argnames=("B", "interpret"))
def fill_matches(litwords, recs, nmatch, B: int, interpret: bool = False):
    """litwords [B, OW] int32, recs [B, 2*NM] interleaved in the
    pack_fill_recs layout (callers build it from rec0/rec1), nmatch [B].
    B must be a multiple of K (callers pad).  Returns [B, OW]."""
    assert B % K == 0, B
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // K,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.SMEM((K * OWP,), jnp.int32),
            pltpu.SMEM((K * RECP,), jnp.int32),
            pltpu.SemaphoreType.DMA((K,)),
            pltpu.SemaphoreType.DMA((K,)),
            pltpu.SemaphoreType.DMA((K,)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((B * OW,), jnp.int32),
        interpret=interpret,
    )(nmatch, litwords.reshape(-1), recs.reshape(-1))
    return out.reshape(B, OW)
