"""Round 8: how cheap can one DEFLATE symbol step get on the scalar core?

Mock of a maximally-trimmed symbol decode to calibrate the real kernel's
target cost, sweeping K (chains) and design knobs:

  T1: trimmed decode, merged-entry format, peek48, sign-bit links,
      no output write
  T2: T1 + staging-register output (pure stores, no RMW)
  T3: T1 + current masked-RMW 2-group write

Entry format (mock): negative => link; else
  [4:0] nb, [13:5] base, [16:14] eb  (length side)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return int(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.int32))


def timeit(fn, *args, reps=3):
    fn_j = jax.jit(fn)
    out0 = fn_j(*args)
    sync(out0)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn_j(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def make(variant, K, steps, wrap='fori'):
    def kernel(seed_ref, out_ref, inw, lt, dt, *outws):
        def z(i, _):
            inw[i] = (i * 40503) & 0x7FFFFFFF
            return 0
        jax.lax.fori_loop(0, 4096, z, 0)

        def zt(i, _):
            # nb in 1..9, base small, eb 0..2 -> bounded advances
            lt[i] = ((i % 9) + 1) | ((i & 255) << 5) | ((i % 3) << 14)
            dt[i & 127] = ((i % 6) + 1) | ((i & 31) << 5) | ((i % 2) << 14)
            return 0
        jax.lax.fori_loop(0, 1024, zt, 0)

        def srl(x, n):
            return jax.lax.shift_right_logical(x, n)
        i32 = jnp.int32

        def step(j, S):
            bitpos, opos, curw = S
            w = srl(bitpos, 5) & 2047
            sh = bitpos & 31
            a = inw[w]
            b = inw[w + 1]
            c = inw[w + 2]
            nsh = 32 - sh
            pk = jnp.where(sh == 0, a, srl(a, sh) | (b << nsh))
            pkh = jnp.where(sh == 0, b, srl(b, sh) | (c << nsh))
            e = lt[pk & 511]
            e2 = lt[512 + (pk & 63)]        # mock sub-probe
            e = jnp.where(e < 0, e2, e)
            nb = e & 31
            eb = srl(e, 14) & 7
            length = (srl(e, 5) & 511) + (srl(pk, nb) & ((i32(1) << eb) - 1))
            k = nb + eb
            pk2 = jnp.where(k == 0, pk, srl(pk, k) | (pkh << (32 - k)))
            de = dt[pk2 & 63]
            de2 = dt[64 + (pk2 & 63)]
            de = jnp.where(de < 0, de2, de)
            dnb = de & 31
            deb = srl(de, 14) & 7
            dist = (srl(de, 5) & 511) + 1 + \
                (srl(pk2, dnb) & ((i32(1) << deb) - 1))
            bp3 = bitpos + k + jnp.where(length > 1, dnb + deb, 0)
            if variant == "T2":
                # staging append of up to 4 bytes (pure store)
                fill = opos & 3
                sw = length | (dist << 8)
                curw = curw | (sw << (8 * fill))
                outws[j][srl(opos, 2) & 1023] = curw
                curw = jnp.where(fill + (length & 7) >= 4,
                                 srl(sw, 32 - 8 * jnp.maximum(fill, 1)),
                                 curw)
            elif variant == "T2a":              # const addr, carried value
                curw = curw | (length << ((opos & 3) * 8))
                outws[j][5] = curw
            elif variant == "T2b":              # const addr, const value
                outws[j][5] = i32(7)
            elif variant == "T2c":              # dyn addr, simple value
                outws[j][srl(opos, 2) & 1023] = length
            elif variant == "T3":
                ow = outws[j]
                p0 = opos & 4091
                wi = srl(p0, 2)
                psh = (p0 & 3) * 8
                m = i32(0xFF)
                ma = m << psh
                va = (length & 0xFF) << psh
                x = ow[wi]
                ow[wi] = (x & ~ma) | (va & ma)
                y = ow[wi + 1]
                mb = jnp.where(psh == 0, i32(0), srl(m, 32 - psh))
                vb = jnp.where(psh == 0, i32(0), srl(length, 32 - psh))
                ow[wi + 1] = (y & ~mb) | (vb & mb)
            opos = opos + (dist & 7) + 1
            return (bitpos + (bp3 & 15) + 1) & 0x1FFFF, opos & 4095, curw

        def step_delayed(j, S):
            # store LAST iteration's result first (operands ready -> no
            # stall), then decode this iteration into the carry
            bitpos, opos, saddr, sval, sval2 = S
            outws[j][saddr] = sval
            if variant == "T2e":
                outws[j][saddr + 1] = sval2
            w = srl(bitpos, 5) & 2047
            sh = bitpos & 31
            a = inw[w]
            b = inw[w + 1]
            c = inw[w + 2]
            nsh = 32 - sh
            pk = jnp.where(sh == 0, a, srl(a, sh) | (b << nsh))
            pkh = jnp.where(sh == 0, b, srl(b, sh) | (c << nsh))
            e = lt[pk & 511]
            e2 = lt[512 + (pk & 63)]
            e = jnp.where(e < 0, e2, e)
            nb = e & 31
            eb = srl(e, 14) & 7
            length = (srl(e, 5) & 511) + (srl(pk, nb) & ((i32(1) << eb) - 1))
            k = nb + eb
            pk2 = jnp.where(k == 0, pk, srl(pk, k) | (pkh << (32 - k)))
            de = dt[pk2 & 63]
            de2 = dt[64 + (pk2 & 63)]
            de = jnp.where(de < 0, de2, de)
            dnb = de & 31
            deb = srl(de, 14) & 7
            dist = (srl(de, 5) & 511) + 1 + \
                (srl(pk2, dnb) & ((i32(1) << deb) - 1))
            bp3 = bitpos + k + jnp.where(length > 1, dnb + deb, 0)
            opos = (opos + (dist & 7) + 1) & 4095
            return ((bitpos + (bp3 & 15) + 1) & 0x1FFFF, opos,
                    srl(opos, 2) & 1023, length, dist)

        def body(i, ch):
            if variant in ("T2d", "T2e"):
                return tuple(step_delayed(j, ch[j]) for j in range(K))
            return tuple(step(j, ch[j]) for j in range(K))

        def body_w(c):
            it, ch = c
            return it + 1, tuple(step(j, ch[j]) for j in range(K))

        def cond_w(c):
            it, ch = c
            alive = ch[0][0] >= 0
            for j in range(1, K):
                alive = alive | (ch[j][0] >= 0)
            return alive & (it < steps)

        def body_hybrid(c):
            # while-of-fori: 64 branch-free steps per while iteration
            it, ch = c

            def inner(i, ch2):
                return tuple(step(j, ch2[j]) for j in range(K))
            ch = jax.lax.fori_loop(0, 64, inner, ch)
            return it + 64, ch
        if variant in ("T2d", "T2e"):
            init = tuple((jnp.int32(seed_ref[j]) & 1023, jnp.int32(0),
                          jnp.int32(j), jnp.int32(0), jnp.int32(0))
                         for j in range(K))
        else:
            init = tuple((jnp.int32(seed_ref[j]) & 1023, jnp.int32(0),
                          jnp.int32(0)) for j in range(K))
        if wrap == "while":
            _, fin = jax.lax.while_loop(cond_w, body_w, (jnp.int32(0), init))
        elif wrap == "hybrid":
            _, fin = jax.lax.while_loop(
                lambda c: cond_w(c), body_hybrid, (jnp.int32(0), init))
        else:
            fin = jax.lax.fori_loop(0, steps, body, init)
        out_ref[0] = fin[0][1]

    def run(seed):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((4200,), jnp.int32),
                            pltpu.SMEM((1024,), jnp.int32),
                            pltpu.SMEM((128,), jnp.int32)] +
            [pltpu.SMEM((1032,), jnp.int32) for _ in range(K)],
        )(seed)
    return run


def main():
    print("devices:", jax.devices())
    seed = jnp.asarray(np.arange(16, dtype=np.int32) * 977)
    S = 1_000_000
    variants = sys.argv[1:] or ["T1", "T2", "T3"]
    for v in variants:
        vv, _, wrap = v.partition(":")
        wrap = wrap or "fori"
        for K in (4, 8):
            d = timeit(make(vv, K, S, wrap), seed)
            print(f"{v} K={K}: {d/S/K*1e9:6.2f} ns/sym/chain "
                  f"({d*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
