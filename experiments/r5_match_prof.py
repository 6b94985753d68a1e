"""Round-5: find_matches internals on the real chip.

find_matches is ~44 ms of the 256-block bucket (r2_enc_stages).  This
splits it: window construction, the 9-operand tier sort, the lag
compares, the restore sort, merge-extension — to find where the time
actually goes before restructuring.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(name, fn, *args, reps=5):
    import jax
    import jax.numpy as jnp
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    int(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.int32))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    int(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.int32))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from deflate_tpu.ops import lz77 as LZ
    from deflate_tpu.utils.tables import BLOCK_SIZE, MAX_MATCH, MIN_MATCH

    NB = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(42)
    import bench
    data = bench.make_corpus(rng, NB * BLOCK_SIZE)
    buf = np.frombuffer(data, np.uint8)
    blocks = jnp.asarray(buf.reshape(NB, BLOCK_SIZE))
    blens = jnp.full((NB,), BLOCK_SIZE, jnp.int32)
    N = BLOCK_SIZE
    K = 4
    WW = 8

    timeit("find_matches (full, K=4 ww=8)",
           jax.jit(jax.vmap(lambda b, l: LZ.find_matches(b, l, K))),
           blocks, blens)

    def windows(block):
        w = LZ._aligned_words(block)
        wsh = [w]
        for j in range(1, WW + 2):
            wsh.append(LZ._shift_fwd(w, j, jnp.uint32(0)))
        wins = []
        for j in range(WW):
            phases = [wsh[j]]
            for p in range(1, 4):
                phases.append((wsh[j] >> (8 * p))
                              | (wsh[j + 1] << (32 - 8 * p)))
            wins.append(jnp.concatenate(phases))
        return wins

    timeit("  windows alone", jax.jit(jax.vmap(windows)), blocks)

    def keyed(block, blen):
        wins = windows(block)
        nw = N // 4
        iw = jnp.arange(nw, dtype=jnp.int32)
        pos_pm = jnp.concatenate([4 * iw + p for p in range(4)])
        valid = pos_pm < blen - (MIN_MATCH - 1)
        h = LZ._hash15(wins[0] & jnp.uint32(0x00FFFFFF))
        key = jnp.where(valid, (h << 15) | pos_pm, (1 << 30) + pos_pm)
        return [key] + wins

    timeit("  windows+hash+key", jax.jit(jax.vmap(keyed)), blocks, blens)

    ops = jax.jit(jax.vmap(keyed))(blocks, blens)
    ops = [o.block_until_ready() for o in ops]

    def tier_sort(*ops):
        return jax.lax.sort(list(ops), dimension=-1, num_keys=1)

    timeit("  tier sort (9 operands)", jax.jit(tier_sort), *ops)
    sops = jax.jit(tier_sort)(*ops)
    sops = [o.block_until_ready() for o in sops]

    def tier_sort5(*ops):
        return jax.lax.sort(list(ops[:5]), dimension=-1, num_keys=1)

    timeit("  tier sort (5 operands)", jax.jit(tier_sort5), *ops)

    def tier_sort2(*ops):
        return jax.lax.sort(list(ops[:2]), dimension=-1, num_keys=1)

    timeit("  tier sort (2 operands)", jax.jit(tier_sort2), *ops)

    def lags(skey, *swins):
        spos = skey & 0x7FFF
        shash = skey >> 15
        svalid = (skey < (1 << 30)).astype(jnp.int32)
        slimit = jnp.minimum(MAX_MATCH, 32768 - spos)
        best_l = jnp.zeros_like(spos)
        best_d = jnp.zeros_like(spos)
        for k in range(1, K + 1):
            same = ((shash == LZ._shift_back(shash, k, -1)).astype(jnp.int32)
                    * svalid * LZ._shift_back(svalid, k, 0))
            dist = spos - LZ._shift_back(spos, k, 0)
            L = jnp.zeros_like(spos)
            run = jnp.ones_like(spos)
            for j in range(WW):
                x = swins[j] ^ LZ._shift_back(swins[j], k, jnp.uint32(0))
                L = L + run * LZ._xor_bytes_eq(x)
                run = run * (x == 0).astype(jnp.int32)
            L = jnp.minimum(L, slimit) * same
            better = L > best_l
            best_l = jnp.where(better, L, best_l)
            best_d = jnp.where(better, dist, best_d)
        return best_l, best_d

    timeit("  lag compares (K=4 x 8w)", jax.jit(jax.vmap(lags)), *sops)
    bl, bd = jax.jit(jax.vmap(lags))(*sops)
    spos = (sops[0] & 0x7FFF).block_until_ready()
    bl.block_until_ready()

    def restore(spos, bl, bd):
        packed = (bl << 16) | bd
        _, pk = jax.lax.sort([spos, packed], dimension=-1, num_keys=1)
        return pk >> 16, pk & 0xFFFF

    timeit("  restore sort (2 operands)", jax.jit(restore), spos, bl, bd)


if __name__ == "__main__":
    main()
