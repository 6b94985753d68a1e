"""Price pallas TPU scalar-serial loops for the decoder redesign.

Questions:
  1. What does a data-dependent scalar chase (x[x[x[...]]]) in VMEM cost
     per step?  (This is the Huffman chain walk's shape.)
  2. Does interleaving K independent chains hide load latency?
  3. What does a dynamic-index word load + arithmetic + dynamic store
     loop cost per iteration (the emit/copy shape)?

Run on the real chip: python experiments/mb_pallas_scalar.py
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
    sync(fn_j(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn_j(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:55s} {dt*1e3:9.3f} ms")
    return dt


N = 1 << 15          # table size (one 32K block)
STEPS = 4096         # chase steps


def make_chase(k_chains: int):
    """k interleaved dependent chases through one VMEM table."""
    def kernel(tbl_ref, out_ref):
        def body(i, carry):
            # carry: int32 vector of k positions packed as tuple
            new = tuple(tbl_ref[c] for c in carry)
            return new
        init = tuple(jnp.int32(j * 17 + 1) for j in range(k_chains))
        fin = jax.lax.fori_loop(0, STEPS, body, init)
        acc = fin[0]
        for c in fin[1:]:
            acc = acc + c
        out_ref[0, 0] = acc

    def run(tbl):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(tbl)
    return run


def emit_loop_kernel(words_ref, out_ref):
    """Decode-ish loop: dynamic word load, shifts, dynamic byte store."""
    def body(i, carry):
        pos, opos = carry
        w0 = words_ref[pos >> 5]
        w1 = words_ref[(pos >> 5) + 1]
        sh = pos & 31
        win = jax.lax.select(sh == 0, w0,
                             (w0 >> sh) | (w1 << (32 - sh)))
        nb = (win & 15) + 1
        out_ref[opos] = win & 0xFF
        return pos + nb, opos + 1

    jax.lax.fori_loop(0, STEPS, body, (jnp.int32(0), jnp.int32(0)))


def run_emit(words):
    return pl.pallas_call(
        emit_loop_kernel,
        out_shape=jax.ShapeDtypeStruct((STEPS + 8,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(words)


def copy_loop_kernel(src_ref, out_ref):
    """Vector dynamic-slice copy: 32-word chunks at dynamic offsets."""
    def body(i, carry):
        s, d = carry
        out_ref[pl.ds(d, 32)] = src_ref[pl.ds(s, 32)]
        return (s + 13) % (N - 64), d + 32

    jax.lax.fori_loop(0, 1024, body, (jnp.int32(0), jnp.int32(0)))


def run_copy(src):
    return pl.pallas_call(
        copy_loop_kernel,
        out_shape=jax.ShapeDtypeStruct((1024 * 32 + 64,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))
    words = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int32))

    for k in (1, 2, 4, 8):
        try:
            d = timeit(f"scalar chase x{k} chains, {STEPS} steps",
                       make_chase(k), tbl)
            print(f"    -> {d/STEPS*1e9:.1f} ns/step "
                  f"({d/STEPS/k*1e9:.1f} ns/step/chain)")
        except Exception as e:
            print(f"  chase x{k} FAILED: {type(e).__name__}: {e}")
            break

    try:
        d = timeit(f"emit loop (2 loads+shift+store), {STEPS} it",
                   run_emit, words)
        print(f"    -> {d/STEPS*1e9:.1f} ns/iter")
    except Exception as e:
        print(f"  emit loop FAILED: {type(e).__name__}: {e}")

    try:
        d = timeit("vector copy 32-word dyn slices, 1024 it", run_copy, words)
        print(f"    -> {d/1024*1e9:.1f} ns/iter ({d/1024/128*1e9:.2f} ns/B)")
    except Exception as e:
        print(f"  copy loop FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
