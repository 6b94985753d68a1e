"""Round 4: where do the inflate kernel's 456 ns/advance go?

A: does lax.cond in a Pallas TPU kernel skip the untaken side, or
   execute/predicate both?
B: cost of a minimal realistic Huffman-step body (peek32 + root probe +
   bit advance), K-interleaved, no conds.
C: same with one 3-way cond dispatch around it.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return int(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.int32))


def timeit(name, fn, *args, reps=5):
    fn_j = jax.jit(fn)
    out0 = fn_j(*args)
    sync(out0)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn_j(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:58s} {dt*1e3:9.3f} ms")
    return dt, out0


# ---- A: cond taken-side cost --------------------------------------------
def cond_cost(steps, heavy_side):
    """Loop body: cond(flag, tiny, HEAVY). flag=1 -> tiny side taken.
    If time ~ heavy side, conds are predicated (both sides run)."""
    def kernel(flag_ref, out_ref, smem):
        def z(i, _):
            smem[i] = (i * 7 + 3) & 1023
            return 0
        jax.lax.fori_loop(0, 1024, z, 0)
        flag = flag_ref[0]

        def tiny(c):
            return c + 1

        def heavy(c):
            # ~64 dependent SMEM load+arith ops
            v = c
            for _ in range(heavy_side):
                v = smem[v & 1023] + 1
            return v

        def body(i, c):
            return jax.lax.cond(flag > 0, tiny, heavy, c)
        out_ref[0] = jax.lax.fori_loop(0, steps, body, jnp.int32(1))

    def run(flag):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((1024,), jnp.int32)],
        )(flag)
    return run


# ---- B/C: minimal huffman-ish step --------------------------------------
def huff_step(steps, k, with_cond):
    """Per chain: peek32 (2 loads + funnel), root-table probe (1 load),
    bitpos advance. Optionally wrapped in a 3-way cond dispatch."""
    def kernel(seed_ref, out_ref, inw, tab):
        def z(i, _):
            inw[i] = (i * 40503) & 0x7FFFFFFF
            return 0
        jax.lax.fori_loop(0, 4096, z, 0)

        def zt(i, _):
            tab[i] = ((i * 31 + 1) & 15) | (((i * 7) & 511) << 8)
            return 0
        jax.lax.fori_loop(0, 512, zt, 0)

        def srl(x, n):
            return jax.lax.shift_right_logical(x, n)

        def step(S):
            bitpos, acc = S
            w = srl(bitpos, 5) & 2047
            sh = bitpos & 31
            a = inw[w]
            b = inw[w + 1]
            pk = jnp.where(sh == 0, a, srl(a, sh) | (b << (32 - sh)))
            e = tab[pk & 511]
            nb = (e & 15) + 1
            acc = acc + (srl(e, 8) & 511)
            return bitpos + nb, acc

        def step_cond(S):
            m = S[1] & 3

            def s0(S):
                return step(S)

            def s1(S):
                bitpos, acc = S
                return bitpos + 1, acc + 1

            def s2(S):
                bitpos, acc = S
                return bitpos + 2, acc + 2
            return jax.lax.cond(
                m == 0, s0,
                lambda S2: jax.lax.cond(m == 1, s1, s2, S2), S)

        f = step_cond if with_cond else step

        def body(i, c):
            new = tuple(f(c[j]) for j in range(k))
            return new
        init = tuple((jnp.int32(seed_ref[j]), jnp.int32(0))
                     for j in range(k))
        fin = jax.lax.fori_loop(0, steps, body, init)
        out_ref[0] = fin[0][1]

    def run(seed):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((4200,), jnp.int32),
                            pltpu.SMEM((512,), jnp.int32)],
        )(seed)
    return run


def main():
    print("devices:", jax.devices())
    flag = jnp.asarray(np.ones(8, np.int32))
    S = 2_000_000
    for heavy in (1, 16, 64):
        d, _ = timeit(f"cond tiny-taken, heavy={heavy}, {S} steps",
                      cond_cost(S, heavy), flag, reps=3)
        print(f"    -> {d/S*1e9:.2f} ns/step")

    seed = jnp.asarray(np.arange(8, dtype=np.int32) * 977)
    for k in (1, 4):
        for wc in (False, True):
            d, _ = timeit(
                f"huff-step k={k} cond={wc} {S} steps",
                huff_step(S, k, wc), seed, reps=3)
            print(f"    -> {d/S/k*1e9:.2f} ns/step/chain")


if __name__ == "__main__":
    main()
