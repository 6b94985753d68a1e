"""Isolate wave_fill kernel costs: DMA/grid overhead vs match work."""
import sys, time
import numpy as np
sys.path.insert(0, "..")

def main():
    import jax, jax.numpy as jnp
    from deflate_tpu.ops import wave_fill as WF
    from deflate_tpu.ops.wave import NM
    B = 64
    rng = np.random.default_rng(0)
    lit = jnp.asarray(rng.integers(0, 1 << 30, (B, WF.OW), np.int32))
    def run(nm_val, nrec_len, label):
        rec0 = np.zeros((B, NM), np.int32)
        nrec = nm_val
        if nrec:
            opos = np.sort(rng.integers(8, 32000, (B, nrec)))
            rec0[:, :nrec] = opos | (3 << 16)   # len 6
        rec1 = np.full((B, NM), 4, np.int32)
        recs = WF.pack_fill_recs(jnp.asarray(rec0), jnp.asarray(rec1))
        nm = jnp.full((B,), nrec, jnp.int32)
        out = WF.fill_matches(lit, recs, nm, B)
        int(np.asarray(out[0,0]))
        t0 = time.perf_counter()
        for _ in range(3):
            out = WF.fill_matches(lit, recs, nm, B)
        int(np.asarray(out[0,0]))
        dt = (time.perf_counter()-t0)/3
        print(f"{label:28s} {dt*1e3:8.2f} ms ({dt/B*1e6:.0f} us/block)")
    run(0, 0, "nm=0 (pure DMA+grid)")
    run(100, 100, "nm=100 len6")
    run(3000, 3000, "nm=3000 len6")

if __name__ == "__main__":
    main()
