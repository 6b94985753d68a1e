"""Round 7: do SMEM stores break cross-chain software pipelining?

mb_hot showed K=4 load-only huff-steps pipeline at ~1.5 ns/step/chain.
The real kernel (with stores) runs ~135 ns/symbol serial.  Which store
pattern kills pipelining?

  A: loads only (baseline)
  B: + 1 store/chain to a PRIVATE memref
  C: + 1 store/chain to a SHARED memref (disjoint regions)
  D: + RMW (load+store) to a PRIVATE memref
  E: B but store address = constant (no data dependence)
  G: like B but phase-split — ALL chains' load-trees first, then all
     stores (tests whether stores order against subsequent loads)
  H: like G but with a 5-deep dependent-load chain per step (resembles
     the real symbol decode)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 4


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return int(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.int32))


def timeit(name, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    out0 = fn_j(*args)
    sync(out0)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn_j(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    return dt


def make(variant, steps):
    def kernel(seed_ref, out_ref, inw, tab, *priv):
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

        def step(j, S):
            bitpos, acc = S
            w = srl(bitpos, 5) & 2047
            sh = bitpos & 31
            a = inw[w]
            b = inw[w + 1]
            pk = jnp.where(sh == 0, a, srl(a, sh) | (b << (32 - sh)))
            e = tab[pk & 511]
            nb = (e & 15) + 1
            acc2 = acc + (srl(e, 8) & 511)
            if variant == "B":
                priv[j][acc2 & 1023] = acc2
            elif variant == "C":
                priv[0][(j * 1024) + (acc2 & 1023)] = acc2
            elif variant == "D":
                r = priv[j][acc2 & 1023]
                priv[j][acc2 & 1023] = r + acc2
            elif variant == "E":
                priv[j][j] = acc2
            return bitpos + nb, acc2

        def decode_only(j, S):
            bitpos, acc = S
            w = srl(bitpos, 5) & 2047
            sh = bitpos & 31
            a = inw[w]
            b = inw[w + 1]
            pk = jnp.where(sh == 0, a, srl(a, sh) | (b << (32 - sh)))
            e = tab[pk & 511]
            if variant == "H":
                e = tab[(e + 1) & 511]
                e = tab[(e + 3) & 511]
                e = tab[(e + 5) & 511]
            nb = (e & 15) + 1
            return bitpos + nb, acc + (srl(e, 8) & 511)

        def body(i, c):
            if variant in ("G", "H"):
                new = tuple(decode_only(j, c[j]) for j in range(K))
                for j in range(K):
                    priv[j][new[j][1] & 1023] = new[j][1]
                return new
            return tuple(step(j, c[j]) for j in range(K))
        init = tuple((jnp.int32(seed_ref[j]), jnp.int32(0))
                     for j in range(K))
        fin = jax.lax.fori_loop(0, steps, body, init)
        out_ref[0] = fin[0][1]

    if variant == "C":
        scr = [pltpu.SMEM((K * 1024,), jnp.int32)]
    else:
        scr = [pltpu.SMEM((1024,), jnp.int32) for _ in range(K)]

    def run(seed):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((4200,), jnp.int32),
                            pltpu.SMEM((512,), jnp.int32)] + scr,
        )(seed)
    return run


def main():
    print("devices:", jax.devices())
    seed = jnp.asarray(np.arange(8, dtype=np.int32) * 977)
    S = 2_000_000
    for v in ("A", "B", "G", "H"):
        d = timeit(f"variant {v}", make(v, S), seed)
        print(f"variant {v}: {d/S/K*1e9:6.2f} ns/step/chain "
              f"({d*1e3:.1f} ms total)")


if __name__ == "__main__":
    main()
