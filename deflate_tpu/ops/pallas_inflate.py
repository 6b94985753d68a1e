"""Pallas TPU inflate kernel: table-driven DEFLATE decode on the scalar core.

Reference analog: ``decompressHuffmanBlock`` + ``realDecompress``
(inflate.hpp:226-322) — a per-bit trie walk (SURVEY.md Q7, the #1
throughput lever).  The TPU formulation replaces the trie with zlib-style
two-level canonical decode tables built *inside the kernel* in SMEM, and
recovers instruction-level parallelism by interleaving K independent block
decodes per grid cell: the scalar core pipelines the K dependent-load
chains (measured ~1.8 ns/step/chain vs ~6 ns single-chain, ~12 ns for XLA
gathers — see experiments/mb_*.py).

Architecture per grid cell (one cell decodes K independent blocks):
  1. DMA each block's compressed window HBM->SMEM (in-kernel, dynamic
     offsets from scalar-prefetched manifest arrays).
  2. Per chain: parse the block header (stored/fixed/dynamic per RFC 1951
     3.2.3-3.2.7) and for dynamic blocks build two-level decode tables
     (root-9 litlen / root-6 dist, zlib inflate_table construction) in SMEM.
  3. One interleaved state-machine loop advances all K chains: Huffman
     symbol decode (1-2 table probes), match copies (word-wise when
     aligned, dist>=4), stored-block copies.  Output bytes accumulate in
     SMEM and DMA out to HBM at the end.

Blocks must be self-contained (no cross-block back-references) — the
invariant this package's encoder guarantees (reference quirk Q5,
deflate.hpp:697) and records in the manifest.  Foreign single streams use
models/decoder.py or the host runtime instead.

Error handling: every malformed condition (bad stored LEN/NLEN,
oversubscribed or incomplete trees, invalid symbols, distance past block
start, output overflow, body running past the available bits) sets a
per-chain error flag; the chain halts and the flag is returned to the
host, which falls back to the host decoder.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deflate_tpu.utils import tables as T

# ---- static geometry -----------------------------------------------------
# NOTE: every SMEM slice that is a DMA endpoint must have offset and size
# aligned to 1024 words (Mosaic memref tiling); IN_W, FIX_BASE, STATICS_W
# are chosen for that.
import os
K = int(os.environ.get("PI_K", "4"))   # interleaved chains per grid cell
# window = 1023 words alignment slack + worst-case 32 KiB stored block
# (8194 words) + peek32 lookahead, rounded to 10*1024
IN_W = 10240              # input window words per block (40 KiB)
OUT_W = 8192              # output words per block (32 KiB)
OUT_BYTES = OUT_W * 4

LT_ROOT = 9               # litlen root table bits (zlib ENOUGH_LENS=852)
DT_ROOT = 6               # dist root table bits (zlib ENOUGH_DISTS=592)
LT_SIZE = 896
DT_SIZE = 704
TAB_SLOT = LT_SIZE + DT_SIZE          # one chain's table slot
CL_SIZE = 128             # code-length-code table (root 7, complete)
LENS_W = 320              # per-chain code-length scratch (286+30 <= 316)
CNT_W = 48                # per-chain count/offset scratch
CONST_W = 160             # len/dist base+extra + CL permutation order
FIX_BASE = -(-(K * TAB_SLOT) // 1024) * 1024   # 1024-aligned DMA dest
CONST_BASE = FIX_BASE + TAB_SLOT
STATICS_W = 2048          # DMA'd fixed-table+const payload (1024-aligned)
TABS_W = FIX_BASE + STATICS_W

# const layout inside the statics tail
C_CL_ORDER = 0            # 19 words: CL permutation
C_LITPAY = 32             # 288 words: per-symbol litlen payloads
C_DISTPAY = 320           # 32 words: per-symbol dist payloads

# chain modes
M_DONE, M_HUFF, M_COPY, M_STORED = 0, 1, 2, 3

# ---- table entry format v2 (optimized for a short decode chain) ----------
# link entries are NEGATIVE: sign | (sub_bits << 16) | sub_table_index
# symbol entries are non-negative:  payload | nbits
#   litlen payload: [4:0]=nbits  [7:5]=len extra bits  [16:8]=base
#                   [18:17]=class (0 literal/CL, 1 length, 2 EOB, 3 bad)
#   dist payload:   [4:0]=nbits  [8:5]=dist extra bits [23:9]=base
#                   (invalid dist symbols get extra-bits sentinel 15)
CLS_LIT, CLS_LEN, CLS_EOB, CLS_BAD = 0, 1, 2, 3
INVALID = CLS_BAD << 17
D_INVALID = 15 << 5


def _litlen_payload(sym):
    if sym < 256:
        return (CLS_LIT << 17) | (sym << 8)
    if sym == 256:
        return CLS_EOB << 17
    if sym <= 285:
        li = sym - 257
        return ((CLS_LEN << 17) | (int(T.LENGTH_BASE[li]) << 8)
                | (int(T.LENGTH_EXTRA[li]) << 5))
    return CLS_BAD << 17


def _dist_payload(sym):
    if sym <= 29:
        return (int(T.DIST_BASE[sym]) << 9) | (int(T.DIST_EXTRA[sym]) << 5)
    return D_INVALID


def _cl_payload(sym):
    return sym << 8                       # raw value in the base field


MAX_ACTIONS = 65536       # worst case: len-3/dist-1 matches = 4 actions/3 B
STATE_W = 16              # per-chain spill slots
_NOCOPY = bool(int(os.environ.get("PI_NOCOPY", "0")))  # perf bisect only


# ===================== host-side table construction =======================
def build_table_host(lens, root, cap, payload=_cl_payload,
                     fill=INVALID):
    """NumPy mirror of the in-kernel zlib-style table builder (for the
    fixed-code statics and for differential tests of the kernel builder).

    Returns (table int32 [cap], err bool)."""
    lens = np.asarray(lens, np.int32)
    n = len(lens)
    cnt = np.zeros(16, np.int64)
    for l in lens:
        cnt[l] += 1
    npresent = n - cnt[0]
    tab = np.full(cap, fill, np.int32)
    if npresent == 0:
        return tab, False
    maxlen = max(l for l in lens if l > 0) if npresent else 0
    left = 1
    for l in range(1, 16):
        left = (left << 1) - cnt[l]
        if left < 0:
            return tab, True           # oversubscribed
    # canonical order: counting sort by (len, sym)
    offs = np.zeros(17, np.int64)
    for l in range(1, 16):
        offs[l + 1] = offs[l] + cnt[l]
    work = np.zeros(n, np.int64)
    for sym in range(n):
        if lens[sym]:
            work[offs[lens[sym]]] = sym
            offs[lens[sym]] += 1
    huff = 0                           # bit-reversed code accumulator
    cur_low, cur_off, cur_bits = -1, 0, 0
    next_sub = 1 << root
    err = False
    rem = cnt.copy()                   # remaining-code counts: zlib sizes
    for si in range(npresent):         # each sub-table for the codes NOT
        sym = int(work[si])            # yet placed (count[len]-- in
        l = int(lens[sym])             # inflate_table), so decrement below
        if l <= root:
            entry = payload(sym) | l
            for hi in range(1 << (root - l)):
                tab[huff + (hi << l)] = entry
        else:
            low = huff & ((1 << root) - 1)
            if low != cur_low:
                curr = l - root
                left2 = 1 << curr
                while curr + root < maxlen:
                    left2 -= rem[curr + root]
                    if left2 <= 0:
                        break
                    curr += 1
                    left2 <<= 1
                if next_sub + (1 << curr) > cap:
                    return tab, True
                tab[low] = -(1 << 31) | (curr << 16) | next_sub
                cur_low, cur_off, cur_bits = low, next_sub, curr
                next_sub += 1 << curr
            entry = payload(sym) | (l - root)
            idx0 = huff >> root
            for hi in range(1 << (cur_bits - (l - root))):
                tab[cur_off + idx0 + (hi << (l - root))] = entry
        rem[l] -= 1
        incr = 1 << (l - 1)
        while huff & incr:
            incr >>= 1
        huff = 0 if incr == 0 else (huff & (incr - 1)) + incr
    return tab, err


@functools.lru_cache(maxsize=1)
def make_statics():
    """Fixed-code tables + RFC constant arrays, DMA'd into SMEM slot K."""
    out = np.zeros(STATICS_W, np.int32)
    lit, e1 = build_table_host(np.asarray(T.FIXED_LITLEN_LENGTHS),
                               LT_ROOT, LT_SIZE, _litlen_payload)
    dst, e2 = build_table_host(np.asarray(T.FIXED_DIST_LENGTHS[:30]),
                               DT_ROOT, DT_SIZE, _dist_payload, D_INVALID)
    assert not (e1 or e2)
    out[:LT_SIZE] = lit
    out[LT_SIZE:TAB_SLOT] = dst
    c = TAB_SLOT
    out[c + C_CL_ORDER:c + C_CL_ORDER + 19] = np.asarray(T.CL_ORDER)
    out[c + C_LITPAY:c + C_LITPAY + 286] = np.asarray(
        [_litlen_payload(s) for s in range(286)], np.int64).astype(np.int32)
    out[c + C_DISTPAY:c + C_DISTPAY + 30] = np.asarray(
        [_dist_payload(s) for s in range(30)], np.int64).astype(np.int32)
    return out


# ===================== kernel =============================================
def _kernel(starts_ref, bit0_ref, avail_ref,          # scalar prefetch
            stream_ref, statics_ref,                  # inputs (ANY, VMEM)
            out_ref, status_ref,                      # outputs (VMEM, SMEM)
            inw, outws, tabs, cl_tab, lens, work, cnts, state,
            sems_in, sem_tab, sems_out):
    g = pl.program_id(0)
    i32 = jnp.int32

    def srl(x, n):
        return jax.lax.shift_right_logical(x, n)

    # ---- bulk loads: statics + K block windows (overlapped DMAs) ---------
    cp_tab = pltpu.make_async_copy(
        statics_ref, tabs.at[pl.ds(FIX_BASE, STATICS_W)], sem_tab)
    cp_tab.start()
    cps = []
    for j in range(K):
        # starts are in 1024-word tiles so Mosaic can prove the HBM
        # slice offset is tiling-aligned
        cp = pltpu.make_async_copy(
            stream_ref.at[pl.ds(starts_ref[g * K + j] * 1024, IN_W)],
            inw.at[pl.ds(j * IN_W, IN_W)], sems_in[j])
        cp.start()
        cps.append(cp)
    cp_tab.wait()
    for cp in cps:
        cp.wait()

    CB = CONST_BASE

    def peek32(ibase, bitpos):
        w = ibase + srl(bitpos, 5)
        sh = bitpos & 31
        a = inw[w]
        b = inw[w + 1]
        return jnp.where(sh == 0, a, srl(a, sh) | (b << (32 - sh)))

    # ---- in-kernel zlib-style canonical table build ----------------------
    def build_table(j, lens_base, nsyms, root, tab, tab_base, tab_cap,
                    is_cl, pay_base=None, fill=INVALID):
        """Returns err (i32 0/1). Reads lens[lens_base:+nsyms], writes
        tab[tab_base:+tab_cap]. j indexes the per-chain count scratch.
        Incomplete codes: always an error for the CL table; for litlen/
        dist allowed only as a single code of length 1 (zlib rule)."""
        cb = j * CNT_W

        def zc(l, _):
            cnts[cb + l] = i32(0)
            return 0
        jax.lax.fori_loop(0, 16, zc, 0)

        def count(i, _):
            l = lens[lens_base + i]
            cnts[cb + l] = cnts[cb + l] + 1
            return 0
        jax.lax.fori_loop(0, nsyms, count, 0)
        npresent = nsyms - cnts[cb + 0]

        def kraft(l, c):
            left, maxlen, err = c
            n = cnts[cb + l]
            left = (left << 1) - n
            maxlen = jnp.where(n > 0, l, maxlen)
            return left, maxlen, err | (left < 0).astype(jnp.int32)
        left, maxlen, err = jax.lax.fori_loop(
            1, 16, kraft, (i32(1), i32(0), i32(0)))
        err = err | ((left != 0) & (npresent > 0)
                     & ((is_cl > 0) | (maxlen != 1))).astype(i32)
        err = err | ((is_cl > 0) & (npresent == 0)).astype(i32)

        def offp(l, o):
            cnts[cb + 16 + l] = o
            return o + cnts[cb + l]
        jax.lax.fori_loop(1, 16, offp, i32(0))

        def fill_inv8(t, _):
            for u in range(8):
                tab[tab_base + 8 * t + u] = i32(fill)
            return 0
        # all table caps (896/704/128) are multiples of 8
        jax.lax.fori_loop(0, srl(tab_cap, 3), fill_inv8, 0)

        wb = j * 288

        def sort(i, _):
            l = lens[lens_base + i]

            def put(_):
                o = cnts[cb + 16 + l]
                work[wb + o] = i
                cnts[cb + 16 + l] = o + 1
                return 0
            jax.lax.cond(l > 0, put, lambda _: 0, 0)
            return 0
        jax.lax.fori_loop(0, nsyms, sort, 0)

        def place(si, c):
            huff, cur_low, cur_off, cur_bits, next_sub, err = c
            sym = work[wb + si]
            l = lens[lens_base + sym]
            pay = (sym << 8) if pay_base is None else tabs[pay_base + sym]

            def short_case(c):
                huff, cur_low, cur_off, cur_bits, next_sub, err = c
                entry = pay | l

                def f(hi, _):
                    tab[tab_base + huff + (hi << l)] = entry
                    return 0
                jax.lax.fori_loop(0, i32(1) << (root - l), f, 0)
                return huff, cur_low, cur_off, cur_bits, next_sub, err

            def long_case(c):
                huff, cur_low, cur_off, cur_bits, next_sub, err = c
                low = huff & ((1 << root) - 1)

                def new_sub(c):
                    cur_low, cur_off, cur_bits, next_sub, err = c

                    def grow(c):
                        curr, left2 = c
                        left2 = left2 - cnts[cb + curr + root]
                        stop = left2 <= 0
                        curr = jnp.where(stop, curr, curr + 1)
                        left2 = jnp.where(stop, i32(-1), left2 << 1)
                        return curr, left2
                    curr, _ = jax.lax.while_loop(
                        lambda c: (c[1] > 0) & (c[0] + root < maxlen),
                        grow, (l - root, i32(1) << (l - root)))
                    err2 = err | (next_sub + (i32(1) << curr)
                                  > tab_cap).astype(i32)
                    safe = jnp.where(err2 > 0, i32(0), next_sub)
                    tab[tab_base + low] = jnp.where(
                        err2 > 0, i32(fill),
                        (curr << 16) | next_sub | i32(-2147483648))
                    return low, safe, curr, next_sub + (i32(1) << curr), err2
                cur_low, cur_off, cur_bits, next_sub, err = jax.lax.cond(
                    low != cur_low, new_sub,
                    lambda c: c,
                    (cur_low, cur_off, cur_bits, next_sub, err))
                entry = pay | (l - root)
                idx0 = srl(huff, root)

                def f(hi, _):
                    tab[tab_base + cur_off + idx0
                        + (hi << (l - root))] = entry
                    return 0
                jax.lax.fori_loop(
                    0, i32(1) << (cur_bits - (l - root)), f, 0)
                return huff, cur_low, cur_off, cur_bits, next_sub, err

            c2 = jax.lax.cond(l <= root, short_case, long_case,
                              (huff, cur_low, cur_off, cur_bits,
                               next_sub, err))
            huff, cur_low, cur_off, cur_bits, next_sub, err = c2
            # zlib inflate_table decrements count[len] per placed code so
            # each new sub-table is sized for the REMAINING codes only
            cnts[cb + l] = cnts[cb + l] - 1
            incr = jax.lax.while_loop(
                lambda v: (huff & v) != 0,
                lambda v: srl(v, 1), i32(1) << (l - 1))
            huff = jnp.where(incr == 0, i32(0),
                             (huff & (incr - 1)) + incr)
            return huff, cur_low, cur_off, cur_bits, next_sub, err

        c = jax.lax.fori_loop(
            0, npresent, place,
            (i32(0), i32(-1), i32(0), i32(0), i32(1) << root, err))
        return c[5]

    # ---- header parse (dynamic chain index j) ----------------------------
    def parse_header(j, _):
        ib = j * IN_W
        sb = j * STATE_W
        bidx = g * K + j
        bitpos = bit0_ref[bidx]
        avail = avail_ref[bidx]

        def rd(bitpos, n):
            v = peek32(ib, bitpos) & ((i32(1) << n) - 1)
            return v, bitpos + n

        _bfinal, bitpos = rd(bitpos, 1)
        btype, bitpos = rd(bitpos, 2)

        # defaults (overwritten per type)
        err = (btype == 3).astype(i32)
        mode = i32(M_DONE)
        mrem = i32(0)
        mdist = i32(0)
        lbase = i32(FIX_BASE)
        dbase = i32(FIX_BASE + LT_SIZE)

        def stored_case(args):
            bitpos, err = args
            bp = (bitpos + 7) & ~7
            slen, bp = rd(bp, 16)
            nlen, bp = rd(bp, 16)
            err = err | ((slen ^ nlen) != 0xFFFF).astype(i32)
            err = err | (bp + 8 * slen > avail).astype(i32)
            err = err | (slen > OUT_BYTES).astype(i32)
            src_byte = srl(bp, 3)
            mode = jnp.where((err > 0) | (slen == 0), i32(M_DONE),
                             i32(M_STORED))
            return (mode, bp + 8 * slen, slen, src_byte,
                    i32(FIX_BASE), i32(FIX_BASE + LT_SIZE), err)

        def fixed_case(args):
            bitpos, err = args
            return (i32(M_HUFF), bitpos, i32(0), i32(0),
                    i32(FIX_BASE), i32(FIX_BASE + LT_SIZE), err)

        def dynamic_case(args):
            bitpos, err = args
            jl = j * LENS_W
            hlit, bitpos = rd(bitpos, 5)
            hdist, bitpos = rd(bitpos, 5)
            hclen, bitpos = rd(bitpos, 4)
            nlit = hlit + 257
            ndist = hdist + 1
            ncl = hclen + 4
            err = err | (nlit > 286).astype(i32) | (ndist > 30).astype(i32)

            def zcl(t, _):
                lens[jl + t] = i32(0)
                return 0
            jax.lax.fori_loop(0, 19, zcl, 0)

            def rdcl(t, bp):
                v = peek32(ib, bp) & 7
                lens[jl + tabs[CB + C_CL_ORDER + t]] = v
                return bp + 3
            bitpos = jax.lax.fori_loop(0, ncl, rdcl, bitpos)
            err = err | build_table(j, jl, i32(19), i32(7), cl_tab,
                                    j * CL_SIZE, i32(CL_SIZE), i32(1),
                                    pay_base=None)

            ntot = nlit + ndist

            def rdlens(c):
                i, bp, err = c
                pk = peek32(ib, bp) & 127
                e = cl_tab[j * CL_SIZE + pk]
                nb = e & 31
                sym = srl(e, 8) & 0x1FF
                err = err | ((srl(e, 17) & 3) != 0).astype(i32) | \
                    (e < 0).astype(i32)
                bp = bp + nb

                def lit_len(c):
                    i, bp, err = c
                    lens[jl + i] = sym
                    return i + 1, bp, err

                def rep_prev(c):
                    i, bp, err = c
                    cnt = 3 + (peek32(ib, bp) & 3)
                    bp = bp + 2
                    err = err | (i == 0).astype(i32) | \
                        (i + cnt > ntot).astype(i32)
                    prev = lens[jl + jnp.maximum(i - 1, 0)]

                    def f(t, _):
                        lens[jl + jnp.minimum(i + t, ntot - 1)] = prev
                        return 0
                    jax.lax.fori_loop(0, jnp.where(err > 0, 0, cnt), f, 0)
                    return i + cnt, bp, err

                def rep_zero(c):
                    i, bp, err = c
                    is17 = sym == 17
                    cnt = jnp.where(
                        is17, 3 + (peek32(ib, bp) & 7),
                        11 + (peek32(ib, bp) & 127))
                    bp = bp + jnp.where(is17, 3, 7)
                    err = err | (i + cnt > ntot).astype(i32)

                    def f(t, _):
                        lens[jl + jnp.minimum(i + t, ntot - 1)] = i32(0)
                        return 0
                    jax.lax.fori_loop(0, jnp.where(err > 0, 0, cnt), f, 0)
                    return i + cnt, bp, err

                c2 = jax.lax.cond(
                    sym < 16, lit_len,
                    lambda c: jax.lax.cond(sym == 16, rep_prev,
                                           rep_zero, c), (i, bp, err))
                return c2
            i, bitpos, err = jax.lax.while_loop(
                lambda c: (c[0] < ntot) & (c[2] == 0), rdlens,
                (i32(0), bitpos, err))
            err = err | (bitpos > avail).astype(i32)
            # end-of-block code must exist (zlib rule)
            err = err | (lens[jl + 256] == 0).astype(i32)
            err = err | build_table(j, jl, nlit, i32(LT_ROOT), tabs,
                                    j * TAB_SLOT, i32(LT_SIZE), i32(0),
                                    pay_base=CB + C_LITPAY)
            err = err | build_table(j, jl + nlit, ndist, i32(DT_ROOT),
                                    tabs, j * TAB_SLOT + LT_SIZE,
                                    i32(DT_SIZE), i32(0),
                                    pay_base=CB + C_DISTPAY,
                                    fill=D_INVALID)
            mode = jnp.where(err > 0, i32(M_DONE), i32(M_HUFF))
            return (mode, bitpos, i32(0), i32(0),
                    j * TAB_SLOT, i32(j * TAB_SLOT + LT_SIZE), err)

        mode, bitpos, mrem, mdist, lbase, dbase, err = jax.lax.cond(
            btype == 0, stored_case,
            lambda a: jax.lax.cond(
                btype == 1, fixed_case,
                lambda a2: jax.lax.cond(btype == 2, dynamic_case,
                                        lambda a3: (i32(M_DONE), a3[0],
                                                    i32(0), i32(0),
                                                    i32(FIX_BASE),
                                                    i32(FIX_BASE + LT_SIZE),
                                                    i32(1)), a2),
                a),
            (bitpos, err))

        # stored blocks are copied in a separate per-chain phase (the
        # destination refs are per-chain memrefs, which need a static j)
        is_stored = mode == M_STORED
        opos0 = jnp.where(is_stored, mrem, i32(0))

        state[sb + 0] = mode
        state[sb + 1] = bitpos
        state[sb + 2] = opos0
        state[sb + 3] = mrem
        state[sb + 4] = mdist
        state[sb + 5] = lbase
        state[sb + 6] = dbase
        state[sb + 7] = avail
        state[sb + 8] = err
        return 0

    jax.lax.fori_loop(0, K, parse_header, 0)

    # ---- stored-block copy phase (outws[j] memrefs need a static j) ------
    def copy_stored(j):
        outw = outws[j]
        ib = j * IN_W
        sb = j * STATE_W

        def do_stored(_):
            mrem = state[sb + 3]
            src = state[sb + 4]          # byte cursor in the input window
            nw = srl(mrem, 2)
            sh = (src & 3) * 8

            def cp1(t):
                sw = ib + srl(src + 4 * t, 2)
                a = inw[sw]
                b = inw[sw + 1]
                outw[t] = jnp.where(
                    sh == 0, a, srl(a, sh) | (b << (32 - sh)))

            def wcopy8(t, _):
                for u in range(8):
                    cp1(8 * t + u)
                return 0
            nw8 = srl(nw, 3)
            jax.lax.fori_loop(0, nw8, wcopy8, 0)

            def wcopy(t, _):
                cp1(t)
                return 0
            jax.lax.fori_loop(8 * nw8, nw, wcopy, 0)

            def bcopy(t, _):
                p = 4 * nw + t
                s = src + p
                byte = srl(inw[ib + srl(s, 2)], (s & 3) * 8) & 0xFF
                wi = srl(p, 2)
                psh = (p & 3) * 8
                outw[wi] = (outw[wi] & ~(0xFF << psh)) | (byte << psh)
                return 0
            jax.lax.fori_loop(0, mrem & 3, bcopy, 0)
            return 0
        jax.lax.cond(state[sb + 0] == M_STORED, do_stored, lambda _: 0, 0)

    for j in range(K):
        copy_stored(j)

    # ---- per-symbol hot loop (branch-free main path) ---------------------
    # One while_loop iteration advances each of the K chains by ONE full
    # symbol with NO data-dependent branches on the common path: the
    # two-level table probes run unconditionally (junk second probes are
    # in-bounds by table-construction invariants) and lit/EOB/match merge
    # via selects into one masked <=8-byte group write.  Rare long copies
    # (len>8 tail) take the only lax.cond.  Each chain owns a private
    # output memref so Mosaic's alias analysis can software-pipeline the
    # K chains; inw/tabs are load-only shared buffers (no store-load
    # aliasing).  Measured motivation: experiments/mb_match.py put the
    # old cond-tree design at ~60 ns/lit and ~200 ns/match.
    LT_MASK = (1 << LT_ROOT) - 1
    DT_MASK = (1 << DT_ROOT) - 1

    def rot3(w):
        # advance a dist==3 pattern word by one 4-byte group (4 mod 3 = 1)
        return srl(w, 8) | ((srl(w, 8) & 0xFF) << 24)

    def make_step(j):
        outw = outws[j]
        ib = j * IN_W

        def rd_byte(pos):
            return srl(outw[srl(pos, 2)], (pos & 3) * 8) & 0xFF

        def funnel_out(p):
            wi = srl(p, 2)
            sh = (p & 3) * 8
            a = outw[wi]
            b = outw[wi + 1]
            return jnp.where(sh == 0, a, srl(a, sh) | (b << (32 - sh)))

        def wr_group(p, w, m):
            # masked 4-byte write at arbitrary byte pos p
            wi = srl(p, 2)
            sh = (p & 3) * 8
            ma = m << sh
            va = w << sh
            mb = jnp.where(sh == 0, i32(0), srl(m, 32 - sh))
            vb = jnp.where(sh == 0, i32(0), srl(w, 32 - sh))
            a = outw[wi]
            outw[wi] = (a & ~ma) | (va & ma)
            b = outw[wi + 1]
            outw[wi + 1] = (b & ~mb) | (vb & mb)

        def step(S):
            """One iteration: decode one symbol (writing its first <=8
            output bytes) or continue a pending long copy by <=8 bytes.
            The litlen probe runs unconditionally (entry format v2 packs
            class/base/extra-bits into the table entries); then a single
            branch splits the dominant literal case (one-byte RMW,
            ~45 ops) from the full match/copy/EOB machinery (~120 ops) —
            text blocks are mostly literals, and cross-iteration software
            pipelining never happened anyway (data-dependent stores,
            mb_sym.py), so the branch is a straight win."""
            bitpos, opos, live, avail, tbase, crem, cdist = S
            act = live > 0
            copying = crem > 0
            decoding = act & ~copying

            # ---- peek48: bits [bitpos, bitpos+64-sh) from 3 words ----
            w = srl(bitpos, 5)
            sh = bitpos & 31
            a = inw[ib + w]
            b = inw[ib + w + 1]
            c = inw[ib + w + 2]
            nsh = 32 - sh
            pk = jnp.where(sh == 0, a, srl(a, sh) | (b << nsh))
            pkh = jnp.where(sh == 0, b, srl(b, sh) | (c << nsh))

            # ---- litlen probe (unconditional two-level) ----
            e = tabs[tbase + (pk & LT_MASK)]
            sb_l = jnp.minimum(srl(e, 16) & 31, i32(6))
            e2 = tabs[tbase + (e & 0x3FF)
                      + (srl(pk, LT_ROOT) & ((i32(1) << sb_l) - 1))]
            islink = e < 0
            e = jnp.where(islink, e2, e)
            nb = (e & 31) + jnp.where(islink, i32(LT_ROOT), i32(0))
            cls = srl(e, 17) & 3
            base = srl(e, 8) & 0x1FF
            eb = srl(e, 5) & 7
            is_lit = cls == CLS_LIT
            lit_ok = (decoding & is_lit & (e >= 0)
                      & (bitpos + nb <= avail) & (opos < OUT_BYTES))

            def fast_lit(cr):
                """1-2 literals per iteration: the 48-bit peek holds the
                next code too (codes <= 15 bits), so a second literal
                probe amortizes peek48 + loop overhead — text blocks are
                literal runs."""
                bitpos, opos, live, crem, cdist = cr
                pk2l = srl(pk, nb) | (pkh << (32 - nb))
                f = tabs[tbase + (pk2l & LT_MASK)]
                sb2 = jnp.minimum(srl(f, 16) & 31, i32(6))
                f2 = tabs[tbase + (f & 0x3FF)
                          + (srl(pk2l, LT_ROOT) & ((i32(1) << sb2) - 1))]
                flink = f < 0
                f = jnp.where(flink, f2, f)
                nb2 = (f & 31) + jnp.where(flink, i32(LT_ROOT), i32(0))
                two = ((srl(f, 17) & 3) == CLS_LIT) & (f >= 0) \
                    & (bitpos + nb + nb2 <= avail) \
                    & (opos + 2 <= OUT_BYTES)
                base2 = srl(f, 8) & 0x1FF

                wi = srl(opos, 2)
                s8 = (opos & 3) * 8
                ns8 = 32 - jnp.maximum(s8, 1)
                val = base | jnp.where(two, base2 << 8, i32(0))
                m = jnp.where(two, i32(0xFFFF), i32(0xFF))
                a0 = outw[wi]
                outw[wi] = (a0 & ~(m << s8)) | (val << s8)
                spill_m = jnp.where(s8 == 0, i32(0), srl(m, ns8))
                a1 = outw[wi + 1]
                outw[wi + 1] = (a1 & ~spill_m) | \
                    (jnp.where(s8 == 0, i32(0), srl(val, ns8)) & spill_m)
                adv2 = two.astype(i32)
                return (bitpos + nb + adv2 * nb2, opos + 1 + adv2,
                        live, crem, cdist)

            def slow(cr):
                bitpos, opos, live, crem, cdist = cr
                bad = (e < 0) | (cls == CLS_BAD)
                is_eob = cls == CLS_EOB
                is_m = cls == CLS_LEN
                length = jnp.where(
                    is_m, base + (srl(pk, nb) & ((i32(1) << eb) - 1)),
                    i32(1))

                # ---- dist probe from the same peek window ----
                # clamp keeps both shift amounts in [1,31] even for
                # garbage entries (flagged bad); valid k is 1..22
                k = jnp.clip(nb + eb, i32(1), i32(24))
                pk2 = srl(pk, k) | (pkh << (32 - k))
                de = tabs[tbase + LT_SIZE + (pk2 & DT_MASK)]
                sb_d = jnp.minimum(srl(de, 16) & 31, i32(9))
                de2 = tabs[tbase + LT_SIZE + (de & 0x3FF)
                           + (srl(pk2, DT_ROOT) & ((i32(1) << sb_d) - 1))]
                dlink = de < 0
                de = jnp.where(dlink, de2, de)
                dnb = (de & 31) + jnp.where(dlink, i32(DT_ROOT), i32(0))
                deb = srl(de, 5) & 15
                dist = jnp.where(
                    is_m,
                    (srl(de, 9) & 0x7FFF)
                    + (srl(pk2, dnb) & ((i32(1) << deb) - 1)),
                    i32(1))
                bp3 = bitpos + k + jnp.where(is_m, dnb + deb, i32(0))
                bad = bad | (is_m & ((de < 0) | (deb == 15)
                                     | (dist > opos)))
                bad = bad | (bp3 > avail)
                bad = bad | (~is_eob & (opos + length > OUT_BYTES))
                bad = decoding & bad
                ok = decoding & ~bad

                # ---- effective write action for this iteration ----
                eff_len = jnp.where(copying, jnp.minimum(crem, i32(8)),
                                    jnp.minimum(length, i32(8)))
                eff_dist = jnp.where(copying, cdist, dist)
                do_w = copying | (ok & ~is_eob)
                gate = -do_w.astype(i32)          # 0 or 0xFFFFFFFF
                m0 = jnp.where(eff_len >= 4, i32(-1),
                               (i32(1) << (8 * eff_len)) - 1)
                m1 = jnp.where(eff_len <= 4, i32(0),
                               jnp.where(eff_len >= 8, i32(-1),
                                         (i32(1) << (8 * (eff_len - 4)))
                                         - 1))
                # source word: funnel read at opos-dist; dist<4 patterns
                # derive from its low bytes (bytes opos-dist..)
                pb = jnp.maximum(opos - eff_dist, i32(0))
                wsrc = funnel_out(pb)
                bb = wsrc & 0xFF
                rep1 = bb | (bb << 8) | (bb << 16) | (bb << 24)
                hh = wsrc & 0xFFFF
                patw = jnp.where(eff_dist == 1, rep1,
                                 jnp.where(eff_dist == 2, hh | (hh << 16),
                                           (wsrc & 0xFFFFFF) | (bb << 24)))
                use_lit = decoding & is_lit
                w0 = jnp.where(use_lit, base,
                               jnp.where(eff_dist < 4, patw, wsrc))
                p0 = jnp.minimum(opos, i32(OUT_BYTES - 1))
                wr_group(p0, w0, m0 & gate)
                # second group: funnel read AFTER the first store (correct
                # for 4<=dist<8 overlap); dist<4 uses the pattern word
                w1f = funnel_out(jnp.maximum(opos + 4 - eff_dist, i32(0)))
                w1 = jnp.where(eff_dist == 3, rot3(patw),
                               jnp.where(eff_dist < 4, patw, w1f))
                wr_group(p0 + 4, w1, m1 & gate)

                # ---- advance ----
                opos = opos + jnp.where(do_w, eff_len, i32(0))
                crem = jnp.where(copying, crem - eff_len,
                                 jnp.where(ok & is_m, length - eff_len,
                                           i32(0)))
                bitpos = jnp.where(ok, bp3, bitpos)
                live = jnp.where(bad, i32(-1),
                                 jnp.where(ok & is_eob, i32(0), live))
                return bitpos, opos, live, crem, eff_dist

            def active(cr):
                return jax.lax.cond(lit_ok, fast_lit, slow, cr)

            # idle chains (done or errored) skip the whole body — without
            # this, a finished chain costs a full slow-path body on every
            # remaining iteration of its cell
            bitpos, opos, live, crem, cdist = jax.lax.cond(
                act | copying, active, lambda cr: cr,
                (bitpos, opos, live, crem, cdist))
            return bitpos, opos, live, avail, tbase, crem, cdist

        return step

    def make_step_bf(j):
        """Branch-free variant of make_step: NO lax.cond anywhere — every
        class (literal pair / match / copy continuation / EOB / error)
        merges through selects into one pair of masked group writes.

        Rationale: a cond is a real branch on the scalar core, and a
        branch is a scheduling barrier — the K chains' dependent SMEM
        loads can no longer interleave across it, so each chain pays its
        full serial load latency (measured ~60 ns/literal with the
        cond-tree).  The masked body executes more ops per iteration but
        they pipeline across chains."""
        outw = outws[j]
        ib = j * IN_W

        def funnel_out(p):
            wi = srl(p, 2)
            sh = (p & 3) * 8
            a = outw[wi]
            b = outw[wi + 1]
            return jnp.where(sh == 0, a, srl(a, sh) | (b << (32 - sh)))

        def wr_group(p, w, m):
            wi = srl(p, 2)
            sh = (p & 3) * 8
            ma = m << sh
            va = w << sh
            mb = jnp.where(sh == 0, i32(0), srl(m, 32 - sh))
            vb = jnp.where(sh == 0, i32(0), srl(w, 32 - sh))
            a = outw[wi]
            outw[wi] = (a & ~ma) | (va & ma)
            b = outw[wi + 1]
            outw[wi + 1] = (b & ~mb) | (vb & mb)

        def step(S):
            bitpos, opos, live, avail, tbase, crem, cdist = S
            act = live > 0
            copying = act & (crem > 0)
            decoding = act & (crem == 0)

            # ---- peek64: bits [bitpos, bitpos+64-sh) from 3 words ----
            w = srl(bitpos, 5)
            sh = bitpos & 31
            a = inw[ib + w]
            b = inw[ib + w + 1]
            c = inw[ib + w + 2]
            nsh = 32 - sh
            pk = jnp.where(sh == 0, a, srl(a, sh) | (b << nsh))
            pkh = jnp.where(sh == 0, b, srl(b, sh) | (c << nsh))

            # ---- litlen probe (two-level, unconditional) ----
            e = tabs[tbase + (pk & LT_MASK)]
            sb_l = jnp.minimum(srl(e, 16) & 31, i32(6))
            e2 = tabs[tbase + (e & 0x3FF)
                      + (srl(pk, LT_ROOT) & ((i32(1) << sb_l) - 1))]
            islink = e < 0
            e = jnp.where(islink, e2, e)
            nb = (e & 31) + jnp.where(islink, i32(LT_ROOT), i32(0))
            cls = srl(e, 17) & 3
            base = srl(e, 8) & 0x1FF
            eb = srl(e, 5) & 7
            bad0 = (e < 0) | (cls == CLS_BAD)
            is_lit = (cls == CLS_LIT) & ~bad0
            is_eob = (cls == CLS_EOB) & ~bad0
            is_m = (cls == CLS_LEN) & ~bad0

            # ---- second-literal probe (unconditional) ----
            nbc = jnp.clip(nb, i32(1), i32(24))
            pk2l = srl(pk, nbc) | (pkh << (32 - nbc))
            f = tabs[tbase + (pk2l & LT_MASK)]
            sb2 = jnp.minimum(srl(f, 16) & 31, i32(6))
            f2 = tabs[tbase + (f & 0x3FF)
                      + (srl(pk2l, LT_ROOT) & ((i32(1) << sb2) - 1))]
            flink = f < 0
            f = jnp.where(flink, f2, f)
            nb2 = (f & 31) + jnp.where(flink, i32(LT_ROOT), i32(0))
            lit2 = ((srl(f, 17) & 3) == CLS_LIT) & (f >= 0)
            base2 = srl(f, 8) & 0x1FF

            # ---- dist probe at k = nb + eb (unconditional) ----
            length = base + (srl(pk, nbc) & ((i32(1) << eb) - 1))
            k = jnp.clip(nb + eb, i32(1), i32(24))
            pk3 = srl(pk, k) | (pkh << (32 - k))
            de = tabs[tbase + LT_SIZE + (pk3 & DT_MASK)]
            sb_d = jnp.minimum(srl(de, 16) & 31, i32(9))
            de2 = tabs[tbase + LT_SIZE + (de & 0x3FF)
                       + (srl(pk3, DT_ROOT) & ((i32(1) << sb_d) - 1))]
            dlink = de < 0
            de = jnp.where(dlink, de2, de)
            dnb = (de & 31) + jnp.where(dlink, i32(DT_ROOT), i32(0))
            deb = srl(de, 5) & 15
            dnbc = jnp.clip(dnb, i32(0), i32(24))
            dist = (srl(de, 9) & 0x7FFF) + (srl(pk3, dnbc)
                                            & ((i32(1) << deb) - 1))

            # ---- classify: every decoding iteration is exactly one of
            # lit1 / mt_ok / eob_ok / bad ----
            lit1 = (decoding & is_lit & (bitpos + nb <= avail)
                    & (opos < OUT_BYTES))
            two = (lit1 & lit2 & (bitpos + nb + nb2 <= avail)
                   & (opos + 2 <= OUT_BYTES))
            bp_m = bitpos + k + dnb + deb
            mt_ok = (decoding & is_m & (de >= 0) & (deb != 15)
                     & (dist <= opos) & (bp_m <= avail)
                     & (opos + length <= OUT_BYTES))
            eob_ok = decoding & is_eob & (bitpos + nb <= avail)
            bad = decoding & ~(lit1 | mt_ok | eob_ok)

            # ---- unified write: one or two masked 4-byte groups ----
            eff_len = jnp.where(copying, jnp.minimum(crem, i32(8)),
                      jnp.where(mt_ok, jnp.minimum(length, i32(8)),
                      jnp.where(lit1, 1 + two.astype(i32), i32(0))))
            eff_dist = jnp.where(copying, cdist, dist)
            do_w = copying | mt_ok | lit1
            gate = -do_w.astype(i32)
            is_cp = copying | mt_ok
            gate_cp = -is_cp.astype(i32)

            m0 = jnp.where(eff_len >= 4, i32(-1),
                           (i32(1) << (8 * eff_len)) - 1)
            m1 = jnp.where(eff_len <= 4, i32(0),
                           jnp.where(eff_len >= 8, i32(-1),
                                     (i32(1) << (8 * (eff_len - 4))) - 1))
            pb = jnp.maximum(opos - eff_dist, i32(0))
            wsrc = funnel_out(pb)
            bb = wsrc & 0xFF
            rep1 = bb | (bb << 8) | (bb << 16) | (bb << 24)
            hh = wsrc & 0xFFFF
            patw = jnp.where(eff_dist == 1, rep1,
                             jnp.where(eff_dist == 2, hh | (hh << 16),
                                       (wsrc & 0xFFFFFF) | (bb << 24)))
            litw = base | (base2 << 8)
            w0 = jnp.where(lit1, litw,
                           jnp.where(eff_dist < 4, patw, wsrc))
            p0 = jnp.minimum(opos, i32(OUT_BYTES - 1))
            wr_group(p0, w0, m0 & gate)
            # second group: source read AFTER the first store (correct
            # for 4<=dist<8 overlap); dist<4 uses the pattern word
            w1f = funnel_out(jnp.maximum(opos + 4 - eff_dist, i32(0)))
            w1 = jnp.where(eff_dist == 3, rot3(patw),
                           jnp.where(eff_dist < 4, patw, w1f))
            wr_group(p0 + 4, w1, m1 & gate_cp)

            # ---- advance ----
            adv_bits = jnp.where(lit1, nb + two.astype(i32) * nb2,
                       jnp.where(mt_ok, k + dnb + deb,
                       jnp.where(eob_ok, nb, i32(0))))
            bitpos = bitpos + adv_bits
            opos = opos + jnp.where(do_w, eff_len, i32(0))
            crem = jnp.where(copying, crem - eff_len,
                             jnp.where(mt_ok, length - eff_len, i32(0)))
            live = jnp.where(bad, i32(-1),
                             jnp.where(eob_ok, i32(0), live))
            return bitpos, opos, live, avail, tbase, crem, eff_dist

        return step

    _BF = bool(int(os.environ.get("PI_BF", "0")))
    steps = [(make_step_bf if _BF else make_step)(j) for j in range(K)]

    def chain_init(j):
        sb = j * STATE_W
        return (state[sb + 1], state[sb + 2],
                (state[sb + 0] == M_HUFF).astype(i32),
                state[sb + 7], state[sb + 5], i32(0), i32(1))

    def loop_body(c):
        it, chains = c
        return it + 1, tuple(steps[j](chains[j]) for j in range(K))

    def loop_cond(c):
        it, chains = c
        any_live = chains[0][2] > 0
        for j in range(1, K):
            any_live = any_live | (chains[j][2] > 0)
        return any_live & (it < MAX_ACTIONS)

    init = (i32(0), tuple(chain_init(j) for j in range(K)))
    it_fin, chains = jax.lax.while_loop(loop_cond, loop_body, init)

    for j in range(K):
        bitpos, opos, live = chains[j][0], chains[j][1], chains[j][2]
        sb = j * STATE_W
        err = state[sb + 8] | (live != 0).astype(i32)
        status_ref[g, 4 * j + 0] = opos
        status_ref[g, 4 * j + 1] = err
        status_ref[g, 4 * j + 2] = bitpos
        # live for the caller; the cell's iteration count for profiling
        # (experiments/r2_decode_prof.py) — live is 0/-1 here, so pack
        # both: low bit flags error, upper bits carry the count
        status_ref[g, 4 * j + 3] = (it_fin << 1) | (live != 0).astype(i32)
    cps_out = []
    for j in range(K):
        cp = pltpu.make_async_copy(
            outws[j].at[pl.ds(0, OUT_W)],
            out_ref.at[pl.ds((g * K + j) * OUT_W, OUT_W)], sems_out[j])
        cp.start()
        cps_out.append(cp)
    for cp in cps_out:
        cp.wait()


@functools.partial(jax.jit, static_argnames=("grid", "interpret"))
def _inflate_blocks_jit(stream_words, starts_w, bit0, avail, statics,
                        grid: int, interpret: bool = False):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # DMA'd per grid cell
            # whole-array block (block==array dims): each cell writes row g
            pl.BlockSpec((grid, 4 * K), lambda g, *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((K * IN_W,), jnp.int32),
            # per-chain output memrefs (provably disjoint, so the K chains
            # can software-pipeline); +8 pad: unaligned word-pair RMW
            # writes may touch one word past the end (mask 0 there)
            [pltpu.SMEM((OUT_W + 8,), jnp.int32) for _ in range(K)],
            pltpu.SMEM((TABS_W,), jnp.int32),
            pltpu.SMEM((K * CL_SIZE,), jnp.int32),
            pltpu.SMEM((K * LENS_W,), jnp.int32),
            pltpu.SMEM((K * 288,), jnp.int32),
            pltpu.SMEM((K * CNT_W,), jnp.int32),
            pltpu.SMEM((K * STATE_W,), jnp.int32),
            [pltpu.SemaphoreType.DMA] * K,
            pltpu.SemaphoreType.DMA,
            [pltpu.SemaphoreType.DMA] * K,
        ],
    )
    out, status = pl.pallas_call(
        _kernel,
        grid_spec=gs,
        out_shape=[
            jax.ShapeDtypeStruct((grid * K * OUT_W,), jnp.int32),
            jax.ShapeDtypeStruct((grid, 4 * K), jnp.int32),
        ],
        interpret=interpret,
    )(starts_w, bit0, avail, stream_words, statics)
    return out, status


def prepare_blocks(stream: bytes, bit_offsets, nbits: int | None = None):
    """Host-side prep for the kernel: pad B to the chain multiple, bucket
    blocks by compressed span, align DMA source offsets.

    Returns (kernel_args tuple for _inflate_blocks_jit, grid, inv
    permutation, start_w int32 [gridB] in PERMUTED order)."""
    if nbits is None:
        nbits = len(stream) * 8
    bit_offsets = np.asarray(bit_offsets, np.int64)
    B = len(bit_offsets)
    gridB = -(-B // K) * K
    # pad with repeats of block 0 (decoded and discarded)
    offs = np.concatenate(
        [bit_offsets, np.repeat(bit_offsets[:1], gridB - B)])

    # bucket blocks by compressed span (a proxy for symbol count) so the
    # K chains of a cell finish together — a cell runs until its LONGEST
    # chain ends, and an 8:1 symbol-count mismatch would idle-spin the
    # short chains' slots for most of the cell's iterations
    sidx = np.argsort(offs, kind="stable")
    spans = np.empty(gridB, np.int64)
    sorted_offs = offs[sidx]
    spans[sidx] = np.diff(np.append(sorted_offs, nbits))
    order = np.argsort(-spans, kind="stable")
    inv = np.argsort(order, kind="stable")
    offs = offs[order]
    # DMA source offsets must be 1024-word aligned (Mosaic tiling);
    # passed to the kernel in units of 1024-word tiles
    start_w = ((offs // 32) // 1024 * 1024).astype(np.int32)
    start_tiles = (start_w // 1024).astype(np.int32)
    bit0 = (offs - 32 * start_w.astype(np.int64)).astype(np.int32)
    avail = np.minimum(nbits - 32 * start_w.astype(np.int64),
                       (IN_W - 3) * 32).astype(np.int32)

    pad = (-len(stream)) % 4
    words = np.frombuffer(stream + b"\x00" * pad, np.uint8).view(np.int32)
    words = np.concatenate([words, np.zeros(IN_W, np.int32)])
    args = (jnp.asarray(words), jnp.asarray(start_tiles),
            jnp.asarray(bit0), jnp.asarray(avail),
            jnp.asarray(make_statics()))
    return args, gridB // K, inv, start_w


def inflate_blocks(stream: bytes, bit_offsets, nbits: int | None = None,
                   interpret: bool = False):
    """Decode B independent DEFLATE blocks of one stream on the device.

    bit_offsets: absolute bit position of each block's BFINAL bit.
    Returns (out uint8 [B, 32768], produced int32 [B], err int32 [B],
    end_bit int64-ish int [B] absolute bit position after each block).
    """
    B = len(bit_offsets)
    args, grid, inv, start_w = prepare_blocks(stream, bit_offsets, nbits)
    gridB = grid * K
    out, status = _inflate_blocks_jit(*args, grid=grid,
                                      interpret=interpret)
    out = np.asarray(out).reshape(gridB, OUT_W)[inv][:B]
    status = np.asarray(status).reshape(gridB, 4)[inv][:B]
    produced = status[:, 0]
    err = status[:, 1]
    end_bit = (32 * start_w[inv][:B].astype(np.int64)
               + status[:, 2].astype(np.int64))
    return out.view(np.uint8), produced, err, end_bit
