"""Price the primitives for a VECTORIZED (VPU/MXU) inflate redesign.

The scalar-core kernel measures 577 ns/cell-iter (ops-bound, ~135 scalar
cycles per chain-step) -> hard ceiling ~30 MB/s.  A vectorized decoder
needs: per-bit-position funnel peeks + compare-based canonical decode
(elementwise), 64-wide transition-map composition (the gather-free
"tiny gather" via unrolled select-reduce), and rank->payload lookup as a
one-hot MXU matmul.  This benchmark prices each on the real chip, both
in Pallas (VMEM-resident, fori_loop-repeated) and at XLA level (fused).

Run:  python experiments/mb_vpu.py
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
    sync(fn_j(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn_j(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:58s} {dt*1e3:9.3f} ms")
    return dt


# ---------------- A) Pallas VPU elementwise throughput --------------------
def pallas_elemwise(x, R, OPS=32):
    def kernel(x_ref, o_ref):
        def body(i, v):
            for _ in range(OPS // 4):
                v = ((v ^ (v >> 3)) + (v << 1)) | 1
            return v
        o_ref[:] = jax.lax.fori_loop(0, R, body, x_ref[:])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


# ---------------- B) Pallas compose64 (select-reduce) ---------------------
# state E: [64, N] int32, values in [0, 64).  One compose round:
# E2[i, n] = E[E[i, n], n]  via 64 unrolled compare+selects.
def pallas_compose64(E, R):
    def kernel(e_ref, o_ref):
        def body(_, E):
            acc = jnp.zeros_like(E)
            for j in range(64):
                acc = acc + jnp.where(E == j, e_ref[j:j + 1, :], 0)
            return acc & 63

        o_ref[:] = jax.lax.fori_loop(0, R, body, e_ref[:])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(E.shape, E.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(E)


# ---------------- C) Pallas MXU one-hot lookup ----------------------------
# ranks [T] in [0,512); table [512, 8] f32; out [T, 8] = onehot @ table
def pallas_onehot_lookup(ranks, table, R):
    T = ranks.shape[0]

    def kernel(r_ref, t_ref, o_ref):
        def body(_, acc):
            oh = (r_ref[:][:, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (T, 512), 1)
                  ).astype(jnp.float32)
            return acc + jnp.dot(oh, t_ref[:],
                                 preferred_element_type=jnp.float32)

        o_ref[:] = jax.lax.fori_loop(
            0, R, body, jnp.zeros((T, 8), jnp.float32))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(ranks, table)


# ---------------- D) XLA fused elementwise with in-jit repeat -------------
def xla_elemwise(x, R, OPS=32):
    def body(i, v):
        for _ in range(OPS // 4):
            v = ((v ^ (v >> 3)) + (v << 1)) | 1
        return v
    return jax.lax.fori_loop(0, R, body, x)


# ---------------- E) XLA compose64 at [64, N] ----------------------------
def xla_compose64(E, R):
    def body(_, E):
        acc = jnp.zeros_like(E)
        for j in range(64):
            acc = acc + jnp.where(E == j, E[j:j + 1, :], 0)
        return acc & 63
    return jax.lax.fori_loop(0, R, body, E)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    # A
    N = 2 * 1024 * 1024 // 4            # 512K int32 = 2 MB in VMEM
    x = jnp.asarray(rng.integers(0, 1 << 30, (512, N // 512),
                                 dtype=np.int32))
    R, OPS = 256, 32
    d = timeit(f"pallas elemwise [{x.shape}] x{R} reps of {OPS} ops",
               lambda v: pallas_elemwise(v, R, OPS), x)
    tot = x.size * R * OPS
    print(f"    -> {tot/d/1e9:.1f} Gel-ops/s ({d/tot*1e12:.3f} ps/el-op)")

    d = timeit(f"XLA    elemwise [{x.shape}] x{R} reps of {OPS} ops",
               lambda v: xla_elemwise(v, R, OPS), x)
    print(f"    -> {tot/d/1e9:.1f} Gel-ops/s ({d/tot*1e12:.3f} ps/el-op)")

    # B
    NL = 4 * 1024                        # 64x4K = 256K elements, 1 MB
    E = jnp.asarray(rng.integers(0, 64, (64, NL), dtype=np.int32))
    R2 = 64
    d = timeit(f"pallas compose64 [64,{NL}] x{R2} rounds",
               lambda v: pallas_compose64(v, R2), E)
    per = d / R2 / NL
    print(f"    -> {per*1e9:.2f} ns per 64-state map-compose (per lane)")

    d = timeit(f"XLA    compose64 [64,{NL}] x{R2} rounds",
               lambda v: xla_compose64(v, R2), E)
    print(f"    -> {d/R2/NL*1e9:.2f} ns per 64-state map-compose (per lane)")

    # C
    T = 2048
    ranks = jnp.asarray(rng.integers(0, 512, (T,), dtype=np.int32))
    table = jnp.asarray(rng.random((512, 8), np.float32))
    R3 = 64
    d = timeit(f"pallas one-hot lookup [{T}]x512 table x{R3}",
               lambda r, t: pallas_onehot_lookup(r, t, R3), ranks, table)
    print(f"    -> {d/R3/T*1e9:.2f} ns per lookup")


if __name__ == "__main__":
    main()
