"""Round 6: what does ONE match symbol cost in the inflate kernel?

Handcrafted fixed-Huffman streams with an exact symbol mix; vary the
match count N so slope = per-match cost (per-block fixed costs cancel).

  M3   : 4 seed literals + N x (len3,dist4)    -> short-copy path
  M8    : 16 seed literals + N x (len8,dist16)  -> short-copy path
  M258  : 1032 seed literals + N x (len258,dist1024) -> longer/far path
  LIT   : N literals                            -> baseline
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from deflate_tpu.ops import pallas_inflate as PI  # noqa: E402


class BitWr:
    def __init__(self):
        self.bits = []

    def wr(self, v, n):          # LSB-first
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def wr_huff(self, code, n):  # MSB-first (RFC 3.1.1)
        for i in range(n - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self):
        by = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            by[i >> 3] |= b << (i & 7)
        return bytes(by)


def fixed_lit(w, v):
    assert v < 144
    w.wr_huff(0x30 + v, 8)


def fixed_match(w, length, dist):
    from deflate_tpu.utils import tables as T
    # length code
    li = int(np.searchsorted(np.asarray(T.LENGTH_BASE), length, "right")) - 1
    code = 257 + li
    if code <= 279:
        w.wr_huff(code - 256, 7)
    else:
        w.wr_huff(0xC0 + code - 280, 8)
    eb = int(T.LENGTH_EXTRA[li])
    if eb:
        w.wr(length - int(T.LENGTH_BASE[li]), eb)
    di = int(np.searchsorted(np.asarray(T.DIST_BASE), dist, "right")) - 1
    w.wr_huff(di, 5)
    deb = int(T.DIST_EXTRA[di])
    if deb:
        w.wr(dist - int(T.DIST_BASE[di]), deb)


def make_stream(nlit_seed, n, length, dist, lit_only=False):
    w = BitWr()
    w.wr(1, 1)          # BFINAL
    w.wr(1, 2)          # fixed
    out = bytearray()
    for i in range(nlit_seed):
        v = (i * 37 + 11) % 144
        fixed_lit(w, v)
        out.append(v)
    for i in range(n):
        if lit_only:
            v = (i * 53 + 7) % 144
            fixed_lit(w, v)
            out.append(v)
        else:
            fixed_match(w, length, dist)
            for _ in range(length):
                out.append(out[-dist])
    w.wr_huff(0, 7)     # EOB
    return w.bytes(), bytes(out)


def time_case(st, B=256, reps=4):
    import jax.numpy as jnp
    offs = np.zeros(B, np.int64)
    out, produced, err, _ = PI.inflate_blocks(st, offs)
    assert all(err == 0), "kernel error"
    nbits = len(st) * 8
    start_w = ((offs // 32) // 1024 * 1024).astype(np.int32)
    start_tiles = jnp.asarray((start_w // 1024).astype(np.int32))
    bit0 = jnp.asarray((offs - 32 * start_w.astype(np.int64)).astype(np.int32))
    avail = jnp.asarray(np.minimum(
        nbits - 32 * start_w.astype(np.int64),
        (PI.IN_W - 3) * 32).astype(np.int32))
    pad = (-len(st)) % 4
    words = np.frombuffer(st + b"\x00" * pad, np.uint8).view(np.int32)
    words = jnp.asarray(np.concatenate([words, np.zeros(PI.IN_W, np.int32)]))
    statics = jnp.asarray(PI.make_statics())
    grid = B // PI.K

    def once():
        o, s = PI._inflate_blocks_jit(words, start_tiles, bit0, avail,
                                      statics, grid=grid)
        return s

    s = once()
    int(np.asarray(s[0, 0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        s = once()
    int(np.asarray(s[0, 0]))
    dt = (time.perf_counter() - t0) / reps
    return dt / B, int(produced[0])


def main():
    cases = {
        "M3": dict(nlit_seed=4, length=3, dist=4),
        "M8": dict(nlit_seed=16, length=8, dist=16),
        "M258": dict(nlit_seed=1032, length=258, dist=1024),
        "LIT": dict(nlit_seed=0, length=0, dist=0, lit_only=True),
    }
    NS = {"M3": (2000, 8000), "M8": (1000, 4000), "M258": (30, 120),
          "LIT": (8000, 31000)}
    for name, kw in cases.items():
        n1, n2 = NS[name]
        st1, d1 = make_stream(n=n1, **kw)
        st2, d2 = make_stream(n=n2, **kw)
        # correctness spot-check
        o, p, e, _ = PI.inflate_blocks(st1, [0])
        ok = e[0] == 0 and o[0, :p[0]].tobytes() == d1
        t1, _ = time_case(st1)
        t2, _ = time_case(st2)
        per = (t2 - t1) / (n2 - n1)
        fixed = t1 - n1 * per
        print(f"{name:5s} ok={ok} per-symbol={per*1e9:7.1f} ns  "
              f"per-block-fixed={fixed*1e6:7.1f} us  "
              f"out={len(d2)}B t2={t2*1e6:.0f}us "
              f"({len(d2)/t2/1e6:.0f} MB/s)")


if __name__ == "__main__":
    main()
