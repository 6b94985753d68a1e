"""Round 3: DMA into SMEM, byte-RMW copy loop, grid cells.

The serial-decode kernel needs bulk data in/out of SMEM at DMA speed;
SMEM-resident kernel inputs fill at ~600 ns/word (useless).
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


# ---- 1: VMEM -> SMEM DMA + chase + SMEM -> VMEM DMA out ------------------
def dma_chase(n, steps):
    def kernel(tbl_ref, out_ref, smem, sem_in, sem_out):
        cp = pltpu.make_async_copy(tbl_ref, smem, sem_in)
        cp.start()
        cp.wait()

        def body(i, c):
            return smem[c]
        fin = jax.lax.fori_loop(0, steps, body, jnp.int32(1))
        smem[0] = fin
        cp2 = pltpu.make_async_copy(smem, out_ref, sem_out)
        cp2.start()
        cp2.wait()

    def run(tbl):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((n,), jnp.int32),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
        )(tbl)
    return run


# ---- 2: byte-RMW copy loop (back-reference copy shape) -------------------
def byte_copy(steps, k):
    def kernel(dist_ref, out_ref, smem):
        def z(i, _):
            smem[i] = i
            return 0
        jax.lax.fori_loop(0, 64, z, 0)

        def body(i, carry):
            new = []
            for j in range(k):
                opos = carry[j]
                d = dist_ref[j]
                s = opos - d
                sw = smem[(s >> 2) + j * 2048]
                sb = (sw >> ((s & 3) * 8)) & 0xFF
                dwi = (opos >> 2) + j * 2048
                dw = smem[dwi]
                sh = (opos & 3) * 8
                dw = (dw & ~(0xFF << sh)) | (sb << sh)
                smem[dwi] = dw
                new.append((opos + 1) & 8191)
            return tuple(new)
        init = tuple(jnp.int32(64 + j) for j in range(k))
        fin = jax.lax.fori_loop(0, steps, body, init)
        out_ref[0] = fin[0] + smem[5]

    def run(dist):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((2048 * k,), jnp.int32)],
        )(dist)
    return run


# ---- 3: grid of cells, each DMA-in + chase + DMA-out ---------------------
def grid_cells(n, steps_per_cell, ncells):
    def kernel(tbl_ref, out_ref, smem, sem_in, sem_out):
        cp = pltpu.make_async_copy(tbl_ref, smem, sem_in)
        cp.start()
        cp.wait()

        def body(i, c):
            return smem[0, c]
        fin = jax.lax.fori_loop(0, steps_per_cell, body, jnp.int32(1))
        smem[0, 0] = fin
        cp2 = pltpu.make_async_copy(smem, out_ref, sem_out)
        cp2.start()
        cp2.wait()

    def run(tbl):
        return pl.pallas_call(
            kernel,
            grid=(ncells,),
            out_shape=jax.ShapeDtypeStruct((ncells, n), jnp.int32),
            in_specs=[pl.BlockSpec((1, n), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, n), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((1, n), jnp.int32),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
        )(tbl)
    return run


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    n = 8192
    tbl_np = rng.integers(1, n, n, dtype=np.int32)
    tbl = jnp.asarray(tbl_np)

    try:
        for steps in (1000, 200_000):
            d, out = timeit(f"DMA-in 32KiB + chase {steps} + DMA-out",
                            dma_chase(n, steps), tbl, reps=3)
        c = np.int32(1)
        for _ in range(200_000):
            c = tbl_np[c]
        # smem[0]=fin then DMA out: out[0] == fin
        got = int(np.asarray(out)[0])
        print(f"    correctness: got={got} exp={int(c)} "
              f"{'OK' if got == int(c) else '*** MISMATCH ***'}")
    except Exception as e:
        print(f"  dma_chase FAILED: {type(e).__name__}: "
              f"{str(e).split(chr(10))[0][:130]}")

    dist = jnp.asarray(np.full(8, 7, dtype=np.int32))
    for k in (1, 4):
        try:
            d, _ = timeit(f"byte-RMW copy x{k} 500k steps",
                          byte_copy(500_000, k), dist, reps=3)
            print(f"    -> {(d - 0.010)/500_000/k*1e9:.2f} ns/byte/chain")
        except Exception as e:
            print(f"  byte_copy x{k} FAILED: {type(e).__name__}: "
                  f"{str(e).split(chr(10))[0][:130]}")
            break

    npc = 2048
    tblg = jnp.asarray(
        rng.integers(1, npc, (64, npc), dtype=np.int32))
    for ncells in (1, 16, 64):
        try:
            d, _ = timeit(
                f"grid={ncells} cells: DMA+{16384} chase+DMA",
                grid_cells(npc, 16384, ncells), tblg[:ncells], reps=3)
            print(f"    -> {d/ncells*1e3:.3f} ms/cell")
        except Exception as e:
            print(f"  grid={ncells} FAILED: {type(e).__name__}: "
                  f"{str(e).split(chr(10))[0][:130]}")
            break


if __name__ == "__main__":
    main()
