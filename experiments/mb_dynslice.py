"""Price dynamic-offset vector load/store within VMEM (Pallas).

If cheap, the LZ match fill can run on the VPU over VMEM instead of the
scalar core over SMEM (whose DMA is ~0.6 GB/s)."""
import sys, time
import numpy as np
sys.path.insert(0, "..")

def main():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NW = 8192
    NM = 2048
    G = 8          # words per group

    def kernel(rec_ref, buf_ref, out_ref):
        def body(m, acc):
            off = rec_ref[0, m] & 4095
            v = buf_ref[0, pl.ds(off, G)]
            out_ref[0, pl.ds(off + 2048, G)] = v + m
            return acc
        jax.lax.fori_loop(0, NM, body, 0)

    @jax.jit
    def run(rec, buf):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, NW), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(rec, buf)

    rng = np.random.default_rng(0)
    rec = jnp.asarray(rng.integers(0, 4096, (1, NM), np.int32))
    buf = jnp.asarray(rng.integers(0, 1 << 30, (1, NW), np.int32))
    out = run(rec, buf)
    int(jnp.sum(out[0, :1]))
    t0 = time.perf_counter()
    for _ in range(5):
        out = run(rec, buf)
    int(jnp.sum(out[0, :1]))
    dt = (time.perf_counter() - t0) / 5
    print(f"{NM} dyn load+store pairs of {G} words: {dt*1e3:.3f} ms "
          f"({dt/NM*1e9:.1f} ns/pair)")

if __name__ == "__main__":
    main()
