"""Microbench: per-position literal (code,len) apply formulations.

Current encoder path (_apply_table_sorted): seed scatter + cummax +
restore sort over [N] — measured ~3 ns/elem on v5e.  Candidates:
  b) flat 286-term select chain over packed (code|len<<15) scalars
  c) canonical rank-select: membership masks per code length (15x9 u32),
     code = C[len,w] + popcount(maskword & below) with C = base+prefpop
Each formulation is timed standalone (vmapped over 64 blocks) and
verified for equality on random symbol streams.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp

from deflate_tpu.models import encoder as E
from deflate_tpu.ops import huffman as H

N = 32768
NB = 64


def popcount32(x):
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def apply_sorted(skey, counts, codes, lens):
    return E._apply_table_sorted(skey, counts, codes, lens, 286)


def apply_chain(sym, codes, lens):
    pk = codes[:286] | (lens[:286] << 15)
    acc = jnp.zeros_like(sym)
    for s in range(286):
        acc = jnp.where(sym == s, pk[s], acc)
    return acc & 0x7FFF, acc >> 15


def apply_rank(sym, lens):
    """Canonical rank-select: needs only the per-symbol LENGTHS.

    masks[L-1, w]: bit (s&31) of word w set iff lens[s] == L.
    C[L-1, w] = first_code[L] + (#symbols with len L in words < w).
    code = C[len-1, w] + popcount(maskword & ((1<<b)-1)).
    """
    lp = jnp.pad(lens[:286], (0, 2)).reshape(9, 32)           # [9,32]
    Ls = jnp.arange(1, 16, dtype=jnp.int32)[:, None, None]    # [15,1,1]
    eq = (lp[None] == Ls)                                     # [15,9,32]
    masks = jnp.sum(
        jnp.where(eq, jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32),
                  jnp.uint32(0)), axis=2)                     # [15,9]
    wpop = jnp.sum(eq.astype(jnp.int32), axis=2)              # [15,9]
    ppop = jnp.cumsum(wpop, axis=1) - wpop                    # exclusive
    # canonical first codes from bl_count
    blc = jnp.sum((lens[:286, None] ==
                   jnp.arange(1, 16)[None, :]).astype(jnp.int32), 0)  # [15]
    # first_code[L] = (first_code[L-1] + blc[L-1]) << 1, fc[1] = 0
    def stepf(c, x):
        nc = (c + x) << 1
        return nc, nc
    _, fc = jax.lax.scan(stepf, jnp.int32(0),
                         jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                          blc[:14]]))
    C = fc[:, None] + ppop                                    # [15,9]

    w = sym >> 5
    b = (sym & 31).astype(jnp.uint32)
    low = (jnp.uint32(1) << b) - 1
    # select the membership word + C for every L at lane's word w
    selw = [w == wi for wi in range(9)]
    mword = jnp.zeros_like(sym, dtype=jnp.uint32)
    lenv = jnp.zeros_like(sym)
    cv = jnp.zeros_like(sym)
    for li in range(15):
        mw = jnp.zeros_like(sym, dtype=jnp.uint32)
        cw = jnp.zeros_like(sym)
        for wi in range(9):
            mw = mw | jnp.where(selw[wi], masks[li, wi], jnp.uint32(0))
            cw = cw | jnp.where(selw[wi], C[li, wi], 0)
        bit = ((mw >> b) & 1).astype(jnp.int32)
        hit = bit == 1
        lenv = jnp.where(hit, li + 1, lenv)
        mword = jnp.where(hit, mw, mword)
        cv = jnp.where(hit, cw, cv)
    code = cv + popcount32(mword & low).astype(jnp.int32)
    return H.bit_reverse(code, lenv), lenv


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    int(jnp.sum(jnp.ravel(leaf)[:8]).astype(jnp.int32))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    int(jnp.sum(jnp.ravel(leaf)[:8]).astype(jnp.int32))
    dt = (time.perf_counter() - t0) / reps
    per = dt / (NB * N) * 1e9
    print(f"{name:28s} {dt*1e3:8.2f} ms   {per:6.2f} ns/el", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    # skewed symbol distribution like text
    syms = rng.integers(0, 286, (NB, N)).astype(np.int32)
    syms[:, ::3] = rng.integers(97, 123, (NB, (N + 2) // 3))
    sym = jnp.asarray(syms)

    # one shared random-but-valid length table
    hist = np.bincount(syms.ravel(), minlength=288).astype(np.int32)
    lens = H.huffman_code_lengths(jnp.asarray(hist), 15)
    codes, _ = H.canonical_codes(lens)
    lens286, codes286 = lens[:286], codes[:286]

    pos = jnp.arange(N, dtype=jnp.int32)
    skey = jax.vmap(lambda s: jnp.sort((s << 15) | pos))(sym)
    counts = jax.vmap(
        lambda sk: jnp.diff(jnp.searchsorted(
            sk >> 15, jnp.arange(287, dtype=jnp.int32))))(skey)

    fa = jax.jit(jax.vmap(
        lambda sk, c: apply_sorted(sk, c, codes286, lens286)))
    fb = jax.jit(jax.vmap(lambda s: apply_chain(s, codes286, lens286)))
    fc = jax.jit(jax.vmap(lambda s: apply_rank(s, lens286)))

    va = timeit("a) sorted apply", fa, skey, counts)
    vb = timeit("b) select chain", fb, sym)
    vc = timeit("c) rank-select", fc, sym)

    ca, la = np.asarray(va[0]), np.asarray(va[1])
    cb, lb = np.asarray(vb[0]), np.asarray(vb[1])
    cc, lc = np.asarray(vc[0]), np.asarray(vc[1])
    assert (ca == cb).all() and (la == lb).all(), "chain mismatch"
    assert (cb == cc).all() and (lb == lc).all(), "rank mismatch"
    print("all formulations agree")


if __name__ == "__main__":
    main()
