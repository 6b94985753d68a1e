"""Microbenchmarks pinning the v5e cost model for the decoder redesign.

Run on the real chip:  python experiments/mb_decode.py
(Only one TPU process at a time; sync via scalar host transfer per
CLAUDE.md — block_until_ready does not reliably block on the tunnel.)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return int(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.int32))


def timeit(name, fn, *args, reps=5):
    fn_j = jax.jit(fn)
    sync(fn_j(*args))                       # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn_j(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:55s} {dt*1e3:9.3f} ms")
    return dt


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    # ---- primitive costs at decoder-relevant shapes --------------------
    B, OUT = 256, 1 << 15                  # 256 blocks x 32 KiB output
    N = B * OUT                            # 8M lanes

    idx = jnp.asarray(rng.integers(0, OUT, (B, OUT), dtype=np.int32))
    val = jnp.asarray(rng.integers(0, 255, (B, OUT), dtype=np.int32))

    d = timeit("gather [B,32K] take_along_axis",
               lambda v, i: jnp.take_along_axis(v, i, axis=1), val, idx)
    print(f"    -> {d/N*1e9:.3f} ns/elem")

    d = timeit("flat gather [8M] x[idx]", lambda v, i: v[i],
               val.reshape(-1), jnp.asarray(
                   rng.integers(0, N, N, dtype=np.int32)))
    print(f"    -> {d/N*1e9:.3f} ns/elem")

    d = timeit("sort [B,32K] (keys only)", lambda v: jnp.sort(v, axis=1), val)
    print(f"    -> {d/N*1e9:.3f} ns/elem")

    d = timeit("sort [B,32K] 2-operand co-sort",
               lambda k, v: jax.lax.sort((k, v), dimension=1, num_keys=1),
               idx, val)
    print(f"    -> {d/N*1e9:.3f} ns/elem")

    d = timeit("cummax [B,32K]", lambda v: jax.lax.cummax(v, axis=1), val)
    print(f"    -> {d/N*1e9:.3f} ns/elem")

    d = timeit("elementwise 5-op [B,32K]",
               lambda v: ((v * 3) ^ (v >> 2)) + ((v << 1) | 1), val)
    print(f"    -> {d/N*1e9:.3f} ns/elem (per 5 ops)")

    d = timeit("scatter-max [B,32K]",
               lambda v, i: jnp.zeros((B, OUT), jnp.int32).at[
                   jnp.arange(B)[:, None], i].max(v, mode="drop"), val, idx)
    print(f"    -> {d/N*1e9:.3f} ns/elem")

    # gather-via-sort: y[b,i] = v[b, idx[b,i]]
    def gather_via_sort(v, i):
        o = jnp.broadcast_to(jnp.arange(OUT, dtype=jnp.int32)[None], (B, OUT))
        # merge (pos, tag=0, payload=v) and (idx, tag=1, payload=origpos)
        k = jnp.concatenate([o, i], axis=1)
        t = jnp.concatenate([jnp.zeros((B, OUT), jnp.int32),
                             jnp.ones((B, OUT), jnp.int32)], axis=1)
        p = jnp.concatenate([v, o], axis=1)
        k2, t2, p2 = jax.lax.sort((k, t, p), dimension=1, num_keys=2)
        # fill forward the tag0 payloads (tagged cummax)
        src = jnp.where(t2 == 0, (k2 << 9) | (p2 & 0x1FF), -1)
        filled = jax.lax.cummax(src, axis=1) & 0x1FF
        # restore: scatter filled back to orig positions where tag==1
        out = jnp.zeros((B, OUT), jnp.int32).at[
            jnp.arange(B)[:, None],
            jnp.where(t2 == 1, p2, OUT)].set(filled, mode="drop")
        return out
    d = timeit("gather-via-sort [B,32K]", gather_via_sort, val, idx)
    print(f"    -> {d/N*1e9:.3f} ns/elem")

    # ---- serial scan step cost (token-serial design) -------------------
    # per step: 3 word gathers + 2 LUT gathers on [B] + arithmetic
    for BB in (64, 256, 1024):
        W = 1 << 13                         # words per block
        words = jnp.asarray(rng.integers(0, 1 << 31, (BB, W), dtype=np.int32))
        lut = jnp.asarray(rng.integers(0, 1 << 20, (BB, 1 << 15),
                                       dtype=np.int32))
        bidx = jnp.arange(BB)

        def step_body(c, _):
            pos, acc = c
            w0 = words[bidx, (pos >> 5) % W]
            w1 = words[bidx, ((pos >> 5) + 1) % W]
            win = (w0 >> (pos & 31)) | (w1 << (32 - (pos & 31)))
            e = lut[bidx, win & 0x7FFF]
            e2 = lut[bidx, (win >> 11) & 0x7FFF]
            pos = pos + (e & 15) + (e2 & 3) + 1
            return (pos, acc ^ e), None

        def scan_steps(p0, nsteps):
            (p, a), _ = jax.lax.scan(step_body,
                                     (p0, jnp.zeros_like(p0)), None,
                                     length=nsteps)
            return p + a

        p0 = jnp.zeros((BB,), jnp.int32)
        S = 2048
        d = timeit(f"serial scan {S} steps, 4 gathers/[{BB}]",
                   lambda p: scan_steps(p, S), p0, reps=3)
        print(f"    -> {d/S*1e6:.2f} us/step  "
              f"({d/S/BB*1e9:.2f} ns/step/block)")

    # ---- scan ys stacking cost ----------------------------------------
    BB = 256
    def scan_with_ys(p0):
        def body(c, _):
            c = c + 1
            return c, {"a": c, "b": c * 2, "c": c ^ 3}
        _, ys = jax.lax.scan(body, p0, None, length=2048)
        return ys["a"][-1] + ys["b"][0] + ys["c"][5]
    d = timeit("scan 2048 steps with 3x[256] ys stacking",
               scan_with_ys, jnp.zeros((BB,), jnp.int32), reps=3)
    print(f"    -> {d/2048*1e6:.2f} us/step")


if __name__ == "__main__":
    main()
