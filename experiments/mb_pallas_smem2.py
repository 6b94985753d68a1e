"""Round 2 of pallas SMEM probing for the serial-decode kernel design.

 A. correctness of a dependent SMEM chase vs numpy
 B. SMEM-resident kernel INPUT (skip the copy-in loop) + cost
 C. SMEM scratch capacity ceiling
 D. grid amortization of the ~10 ms fixed pallas-call cost
 E. scalar RMW byte-store loop cost (the back-ref copy shape)
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


# ---------- A+B: chase with SMEM input, verified --------------------------
def chase_smem_in(n, steps, k_chains):
    def kernel(tbl_ref, out_ref):
        def body(i, carry):
            return tuple(tbl_ref[c] for c in carry)
        init = tuple(jnp.int32(j * 17 + 1) for j in range(k_chains))
        fin = jax.lax.fori_loop(0, steps, body, init)
        for j, c in enumerate(fin):
            out_ref[j] = c

    def run(tbl):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((k_chains,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(tbl)
    return run


# ---------- C: capacity --------------------------------------------------
def scratch_cap(n_words):
    def kernel(x_ref, out_ref, smem):
        smem[0] = x_ref[0]
        out_ref[0] = smem[0] + x_ref[n_words - 1] * 0
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((n_words,), jnp.int32)],
        )(x)
    return run


# ---------- D: grid amortization ----------------------------------------
def grid_chase(n, steps_per_cell, ncells):
    def kernel(tbl_ref, out_ref):
        g = pl.program_id(0)
        def body(i, c):
            return tbl_ref[c]
        fin = jax.lax.fori_loop(0, steps_per_cell, body,
                                jnp.int32(g % n))
        out_ref[0, 0] = fin
    def run(tbl):
        return pl.pallas_call(
            kernel,
            grid=(ncells,),
            out_shape=jax.ShapeDtypeStruct((ncells, 1), jnp.int32),
            in_specs=[pl.BlockSpec((n,), lambda g: (0,),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda g: (g, 0),
                                   memory_space=pltpu.SMEM),
        )(tbl)
    return run


# ---------- E: byte-RMW copy loop ----------------------------------------
def byte_copy(steps, k):
    """out[opos] = out[opos - dist] at byte granularity, k interleaved."""
    def kernel(dist_ref, out_ref):
        def body(i, carry):
            new = []
            for j in range(k):
                opos = carry[j]
                d = dist_ref[j]
                s = opos - d
                sw = out_ref[(s >> 2) + j * 2048]
                sb = (sw >> ((s & 3) * 8)) & 0xFF
                dwi = (opos >> 2) + j * 2048
                dw = out_ref[dwi]
                sh = (opos & 3) * 8
                dw = (dw & ~(0xFF << sh)) | (sb << sh)
                out_ref[dwi] = dw
                new.append(opos + 1)
            return tuple(new)
        init = tuple(jnp.int32(64 + j) for j in range(k))
        fin = jax.lax.fori_loop(0, steps, body, init)
        out_ref[0] = fin[0]

    def run(dist):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2048 * k,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(dist)
    return run


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    # A: correctness
    n, steps = 4096, 3000
    tbl_np = rng.integers(0, n, n, dtype=np.int32)
    tbl = jnp.asarray(tbl_np)
    d, out = timeit(f"chase SMEM-input n={n} x4 {steps} steps",
                    chase_smem_in(n, steps, 4), tbl, reps=3)
    exp = []
    for j in range(4):
        c = np.int32(j * 17 + 1)
        for _ in range(steps):
            c = tbl_np[c]
        exp.append(int(c))
    got = [int(v) for v in np.asarray(out)]
    print(f"    correctness: got={got} exp={exp} "
          f"{'OK' if got == exp else '*** MISMATCH ***'}")

    # B: marginal step cost with SMEM input
    d1, _ = timeit("chase SMEM-input n=4096 x4 1M steps",
                   chase_smem_in(n, 1 << 20, 4), tbl, reps=3)
    print(f"    -> marginal {(d1 - d)/ (1<<20) * 1e9:.2f} ns/step (x4)")

    # C: capacity
    x = jnp.arange(1 << 16, dtype=jnp.int32)
    for nw in (1 << 15, 1 << 16, 1 << 17, 1 << 18):
        try:
            timeit(f"smem scratch {nw*4//1024} KiB", scratch_cap(nw),
                   x[:nw], reps=1)
        except Exception as e:
            msg = str(e).split('\n')[0][:110]
            print(f"  scratch {nw*4//1024} KiB FAILED: {msg}")
            break

    # D: grid amortization
    tblg = jnp.asarray(rng.integers(0, 1024, 1024, dtype=np.int32))
    for ncells in (1, 16, 64):
        d, _ = timeit(f"grid={ncells} cells x 16384 chase steps",
                      grid_chase(1024, 16384, ncells), tblg, reps=3)
        print(f"    -> {d/ncells*1e3:.3f} ms/cell")

    # E: byte copy
    dist = jnp.asarray(np.full(8, 7, dtype=np.int32))
    for k in (1, 4, 8):
        d, _ = timeit(f"byte-RMW copy x{k} 200k steps", byte_copy(200_000, k),
                      dist, reps=3)
        print(f"    -> {(d - 0.010)/200_000/k*1e9:.2f} ns/byte/chain "
              f"(10ms overhead subtracted)")


if __name__ == "__main__":
    main()
