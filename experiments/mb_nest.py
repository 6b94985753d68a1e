"""Round 5: cost of NESTED loops + conds inside a Pallas scalar kernel.

The inflate kernel's RLE fill measured ~106 ns/word though a bare store
should be ~2 ns. Suspect: inner fori_loop iteration overhead when nested
inside while_loop+cond.
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


def timeit(name, fn, *args, reps=3):
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


def run1(kernel_body, n_in=64):
    def run(x):
        return pl.pallas_call(
            kernel_body,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((8192,), jnp.int32)],
        )(x)
    return run


def flat_store(total):
    def kernel(x_ref, out_ref, smem):
        def b(i, _):
            smem[i & 8191] = i
            return 0
        jax.lax.fori_loop(0, total, b, 0)
        out_ref[0] = smem[5]
    return kernel


def nested_store(outer, inner_dyn):
    """outer iterations, each runs an inner fori of x_ref[0] (=inner_dyn)
    stores -> same total store count as flat when outer*inner == total."""
    def kernel(x_ref, out_ref, smem):
        inner = x_ref[0]

        def ob(i, c):
            def ib(t, _):
                smem[(i + 64 * t) & 8191] = t
                return 0
            jax.lax.fori_loop(0, inner, ib, 0)
            return c
        jax.lax.fori_loop(0, outer, ob, 0)
        out_ref[0] = smem[5]
    return kernel


def nested_store_static(outer, inner):
    def kernel(x_ref, out_ref, smem):
        def ob(i, c):
            def ib(t, _):
                smem[(i + 64 * t) & 8191] = t
                return 0
            jax.lax.fori_loop(0, inner, ib, 0)
            return c
        jax.lax.fori_loop(0, outer, ob, 0)
        out_ref[0] = smem[5]
    return kernel


def while_cond_nested(outer, inner_dyn):
    """Mimic the kernel shape: while_loop outer, cond dispatch, inner
    fori with dynamic count."""
    def kernel(x_ref, out_ref, smem):
        inner = x_ref[0]

        def body(c):
            i, acc = c

            def taken(a):
                def ib(t, _):
                    smem[(i + 64 * t) & 8191] = t
                    return 0
                jax.lax.fori_loop(0, inner, ib, 0)
                return a + 1

            acc = jax.lax.cond(acc >= 0, taken, lambda a: a, acc)
            return i + 1, acc

        fin = jax.lax.while_loop(lambda c: c[0] < outer, body,
                                 (jnp.int32(0), jnp.int32(0)))
        out_ref[0] = fin[1]
    return kernel


def main():
    print("devices:", jax.devices())
    x = jnp.asarray(np.full(8, 64, np.int32))
    T = 1 << 20
    d, _ = timeit(f"flat fori {T} stores", run1(flat_store(T)), x)
    print(f"    -> {d/T*1e9:.2f} ns/store")
    for outer, inner in ((T // 64, 64),):
        d, _ = timeit(f"nested dyn fori {outer}x{inner} stores",
                      run1(nested_store(outer, inner)), x)
        print(f"    -> {d/T*1e9:.2f} ns/store")
        d, _ = timeit(f"nested static fori {outer}x{inner} stores",
                      run1(nested_store_static(outer, inner)), x)
        print(f"    -> {d/T*1e9:.2f} ns/store")
        d, _ = timeit(f"while+cond+dyn-inner {outer}x{inner} stores",
                      run1(while_cond_nested(outer, inner)), x)
        print(f"    -> {d/T*1e9:.2f} ns/store")


if __name__ == "__main__":
    main()
