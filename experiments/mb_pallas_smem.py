"""Can pallas do the serial decode walk with tables in SMEM?

- max usable SMEM scratch size
- dependent scalar chase cost/step in SMEM
- scalar store throughput to SMEM
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


import os
STEPS = int(os.environ.get("STEPS", 4096))


def chase_smem(n: int, k_chains: int):
    """Copy tbl (VMEM in) -> SMEM scratch, then chase k chains."""
    def kernel(tbl_ref, out_ref, smem):
        # bulk copy VMEM->SMEM? try simple loop store per element is slow;
        # instead do it via element loop only for small n... use fori.
        def cp(i, _):
            smem[i] = tbl_ref[i, 0]
            return 0
        jax.lax.fori_loop(0, n, cp, 0)

        def body(i, carry):
            return tuple(smem[c] for c in carry)
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
            scratch_shapes=[pltpu.SMEM((n,), jnp.int32)],
        )(tbl)
    return run


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    for n in (1024, 4096, 16384, 32768):
        tbl = jnp.asarray(rng.integers(0, n, (n, 1), dtype=np.int32))
        try:
            d = timeit(f"smem chase n={n} x1, {STEPS} steps",
                       chase_smem(n, 1), tbl, reps=3)
            print(f"    -> {d/STEPS*1e9:.1f} ns/step (incl copy-in of {n})")
        except Exception as e:
            msg = str(e).split('\n')[0][:120]
            print(f"  n={n} FAILED: {type(e).__name__}: {msg}")
            break

    n = 4096
    tbl = jnp.asarray(rng.integers(0, n, (n, 1), dtype=np.int32))
    for k in (2, 4, 8):
        try:
            d = timeit(f"smem chase n={n} x{k}, {STEPS} steps",
                       chase_smem(n, k), tbl, reps=3)
            print(f"    -> {d/STEPS*1e9:.1f} ns/step "
                  f"({d/STEPS/k*1e9:.1f} ns/step/chain)")
        except Exception as e:
            msg = str(e).split('\n')[0][:120]
            print(f"  x{k} FAILED: {type(e).__name__}: {msg}")
            break


if __name__ == "__main__":
    main()
