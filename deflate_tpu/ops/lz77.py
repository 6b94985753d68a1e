"""Vectorized LZ77 match finding and parsing for one 32 KiB block.

Reference analog: `class LZ77` (deflate.hpp:190-385).  Its fast path walks a
mutable hash-chain table position by position and is *incorrect* (emits stale
offsets — SURVEY.md B1); its best path is an O(n^2) scalar scan.  The
TPU-native design replaces both with data-parallel passes, all deterministic:

  1. candidates: hash every 3-byte window, sort (hash, position) pairs — each
     position's K most recent same-hash predecessors are its chain, exactly
     the hash-chain semantics but produced by one sort instead of a serial
     table. (XLA sort on 32k keys.)
  2. extension: all candidates extend simultaneously, 4 bytes per round via
     u32 gathers, with a while-loop that stops when no lane is still running.
  3. selection: per position keep the longest match, nearest on ties
     (matches the reference's level-3 tie rule, quirk Q4).
  4. parse: greedy (fast) or one-step lazy (best); the token set = positions
     reachable from 0 through next[i] = i + max(len_i, 1), computed by
     pointer doubling in log2(n) scatter/gather rounds instead of a serial
     walk.

Everything is jittable and vmaps over blocks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from deflate_tpu.utils.tables import BLOCK_SIZE, MAX_MATCH, MIN_MATCH

HASH_BITS = 15


def _hash15(tri: jax.Array) -> jax.Array:
    """24-bit window -> 15-bit bucket, multiply-free.

    TPU note: an integer multiply on a large *computed* array sends XLA/
    Mosaic down a scalarizing path (measured 27 ms per 8x32 KiB and 100 s+
    compiles on v5e — the classic `x * 0x9E3779B1` Fibonacci hash is
    unusable).  Shift/xor/add mixing is single-cycle VPU work.
    """
    t = tri
    t = t ^ (t >> 13)
    t = t + (t << 7)
    t = t ^ (t >> 9)
    return (t & jnp.uint32(0x7FFF)).astype(jnp.int32)


def _le_u32(block: jax.Array) -> jax.Array:
    """u32 little-endian load at every byte position (tail zero-padded).

    TPU note: byte-granular shifted slices of a uint8 array lower to a
    pathological relayout (measured 26 ms / 215 s compile per 8x32 KiB on
    v5e).  Formulated instead as aligned u32 word loads + four funnel-shift
    phases interleaved by a stack/reshape — 0.11 ms for the same shapes.
    """
    b4 = block.astype(jnp.uint32).reshape(-1, 4)          # [n/4, 4] aligned
    w = b4[:, 0] | (b4[:, 1] << 8) | (b4[:, 2] << 16) | (b4[:, 3] << 24)
    wn = jnp.concatenate([w[1:], jnp.zeros((1,), jnp.uint32)])
    phases = [w]
    for s in (8, 16, 24):
        phases.append((w >> s) | (wn << (32 - s)))
    return jnp.stack(phases, axis=1).reshape(-1)          # [n]


def find_matches(block: jax.Array, blen: jax.Array, num_cands: int,
                 max_rounds: int = (MAX_MATCH + 6) // 4):
    """Best match (length, distance) at every position of one block.

    block: uint8 [n] (n = BLOCK_SIZE, zero padding past blen)
    blen:  int32 scalar — valid bytes
    num_cands: static chain depth K (4 for fast, 16+ for best)

    Returns (length int32 [n], dist int32 [n]); length < MIN_MATCH means no
    usable match at that position.
    """
    n = block.shape[0]
    u32 = _le_u32(block)
    tri = u32 & jnp.uint32(0x00FFFFFF)
    h = _hash15(tri)

    pos = jnp.arange(n, dtype=jnp.int32)
    valid = pos < blen - (MIN_MATCH - 1)          # a 3-byte window exists
    # key packs (hash << 15 | position); invalid positions sort to the back
    # and carry a unique hash so they never chain with real ones
    key = jnp.where(valid, (h << 15) | pos, (1 << 30) + pos)
    skey = jnp.sort(key)
    spos = skey & 0x7FFF
    shash = skey >> 15

    # K most recent predecessors in the same hash bucket.  Layout note: all
    # per-candidate state is [K, n] — n must live on the TPU lane axis; a
    # [n, K<=16] layout uses 4/128 lanes and relayouts on every op
    # (measured ~12 ms per extension round vs ~10 us this way).
    inv = jnp.zeros((n,), jnp.int32).at[spos].set(pos)  # sort inverse perm
    cands = []
    for k in range(1, num_cands + 1):
        prev = jnp.concatenate([jnp.full((k,), -1, jnp.int32), spos[:-k]])
        ph = jnp.concatenate([jnp.full((k,), -1, jnp.int32), shash[:-k]])
        cands.append(jnp.where(ph == shash, prev, -1)[inv])
    cand = jnp.stack(cands, axis=0)                # [K, n]

    ok = (cand >= 0).astype(jnp.int32)             # [K, n]; int32, not bool —
    ci = jnp.where(ok > 0, cand, 0)                # bool carries relayout

    # parallel extension, 4 bytes per round.  The current-position side is
    # an *affine* index — materialized as a dynamic_slice of a padded copy
    # (an affine gather lowers pathologically on v5e; a slice is free).
    # The candidate side is a genuine random gather (cheap).
    pad = 4 * max_rounds + 4
    u_pad = jnp.concatenate([u32, jnp.zeros((pad,), jnp.uint32)])
    limit = jnp.minimum(MAX_MATCH, blen - pos)     # [n]
    limit = jnp.maximum(limit, 0)

    def round_cond(st):
        _, _, r, nactive = st
        return (r < max_rounds) & (nactive > 0)

    def round_body(st):
        mlen, active, r, _ = st
        off = r * 4
        a = jax.lax.dynamic_slice(u_pad, (off,), (n,))[None, :]
        b = u_pad[ci + off]
        x = a ^ b
        # bytes equal in this round: 0..4 via position of first xor byte
        eq4 = (x == 0).astype(jnp.int32)
        # first differing byte: lowest set bit of x
        lsb = x & (jnp.uint32(0) - x)
        nb = jnp.where(x == 0, 4,
             jnp.where(lsb & jnp.uint32(0xFF), 0,
             jnp.where(lsb & jnp.uint32(0xFF00), 1,
             jnp.where(lsb & jnp.uint32(0xFF0000), 2, 3)))).astype(jnp.int32)
        mlen = mlen + active * nb
        active = active * eq4
        return mlen, active, r + 1, jnp.sum(active)

    mlen0 = jnp.zeros((num_cands, n), jnp.int32)
    mlen, _, _, _ = jax.lax.while_loop(
        round_cond, round_body, (mlen0, ok, 0, jnp.sum(ok)))
    mlen = jnp.minimum(mlen, limit[None, :])
    mlen = mlen * ok * valid.astype(jnp.int32)[None, :]

    dist = pos[None, :] - ci                        # [K, n] (>=1 where ok)

    # drop marginal far matches (zlib "too_far" heuristic): len==3 & dist>4096
    mlen = jnp.where((mlen == MIN_MATCH) & (dist > 4096), 0, mlen)

    # longest match wins; candidates are ordered nearest-first and the
    # strictly-greater compare keeps the first maximum, so ties go to the
    # smallest distance (Q4).  Unrolled over the static K — no argmax along
    # a short axis (which forces a relayout).
    blen_ = mlen[0]
    bdist = dist[0]
    for k in range(1, num_cands):
        better = mlen[k] > blen_
        blen_ = jnp.where(better, mlen[k], blen_)
        bdist = jnp.where(better, dist[k], bdist)
    keep = blen_ >= MIN_MATCH
    return jnp.where(keep, blen_, 0), jnp.where(keep, bdist, 0)


def lazy_filter(length: jax.Array, dist: jax.Array):
    """One-step lazy matching: defer to i+1 when it has a strictly longer
    match (zlib-style; done *correctly*, unlike reference B1/Q4)."""
    nxt = jnp.concatenate([length[1:], jnp.zeros((1,), length.dtype)])
    keep = length >= nxt
    return jnp.where(keep, length, 0), jnp.where(keep, dist, 0)


def greedy_parse(length: jax.Array, blen: jax.Array):
    """Token positions of the greedy parse, via pointer doubling.

    length: int32 [n] — chosen match length per position (0/1/2 = literal).
    Returns mark bool [n]: True where a token (literal or match) starts.
    Positions >= blen are never marked.
    """
    n = length.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    step = jnp.where(length >= MIN_MATCH, length, 1)
    nxt = jnp.minimum(pos + step, n)               # n = absorbing sentinel

    # jump table with sentinel slot
    g = jnp.concatenate([nxt, jnp.array([n], jnp.int32)])     # [n+1]
    mark = jnp.zeros((n + 1,), jnp.bool_).at[0].set(True)
    levels = max(1, (n - 1).bit_length())
    for _ in range(levels):
        # mark ∪ g(mark): scatter current marks through the jump table
        tgt = jnp.where(mark, g, n)
        mark = mark.at[tgt].max(mark)
        g = g[g]                                    # double the jump
    mark = mark[:n] & (pos < blen)
    return mark
