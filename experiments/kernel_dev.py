"""Dev driver for the pallas inflate kernel.

Stages:
  host   — validate build_table_host via a pure-python table-driven decode
           against zlib output (no TPU needed; run with JAX_PLATFORMS=cpu)
  kernel — run the pallas kernel on the real chip on single-block streams
"""
import sys
import zlib

import numpy as np

sys.path.insert(0, "/root/repo")
from deflate_tpu.ops import pallas_inflate as PI  # noqa: E402


def deflate_raw(data, level=6):
    c = zlib.compressobj(level, zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


class BitRd:
    def __init__(self, b):
        self.b = b
        self.pos = 0

    def rd(self, n):
        v = 0
        for i in range(n):
            byte = self.b[self.pos >> 3]
            v |= ((byte >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


def probe(tab, root, br):
    """v2-entry probe: returns the raw resolved entry, consuming its
    bits. Asserts on link-to-link/invalid."""
    save = br.pos
    avail = len(br.b) * 8 - save
    pk = 0
    for i in range(min(15, avail)):
        pk |= ((br.b[(save + i) >> 3] >> ((save + i) & 7)) & 1) << i
    e = int(tab[pk & ((1 << root) - 1)])
    if e < 0:
        sb = (e >> 16) & 31
        e = int(tab[(e & 0x3FF) + ((pk >> root) & ((1 << sb) - 1))])
        assert e >= 0, "link-to-link"
        br.pos = save + root + (e & 31)
    else:
        br.pos = save + (e & 31)
    return e


def probe_litlen(tab, br):
    e = probe(tab, PI.LT_ROOT, br)
    cls = (e >> 17) & 3
    base = (e >> 8) & 0x1FF
    eb = (e >> 5) & 7
    assert cls != PI.CLS_BAD
    if cls == PI.CLS_EOB:
        return 256, 0
    if cls == PI.CLS_LIT:
        return base, 0
    return 257, base + br.rd(eb)      # any length symbol; value=length


def probe_dist(tab, br):
    e = probe(tab, PI.DT_ROOT, br)
    deb = (e >> 5) & 15
    assert deb != 15, "invalid dist symbol"
    return ((e >> 9) & 0x7FFF) + br.rd(deb)


def host_decode(stream):
    """Pure-python inflate using build_table_host tables (oracle for the
    kernel's table construction + probe logic)."""
    from deflate_tpu.utils import tables as T
    br = BitRd(stream)
    out = bytearray()
    while True:
        bfinal = br.rd(1)
        btype = br.rd(2)
        if btype == 0:
            br.pos = (br.pos + 7) & ~7
            ln = br.rd(16)
            nlen = br.rd(16)
            assert (ln ^ nlen) == 0xFFFF
            for _ in range(ln):
                out.append(br.rd(8))
        else:
            if btype == 1:
                lt, e1 = PI.build_table_host(
                    np.asarray(T.FIXED_LITLEN_LENGTHS), PI.LT_ROOT,
                    PI.LT_SIZE, PI._litlen_payload)
                dt, e2 = PI.build_table_host(
                    np.asarray(T.FIXED_DIST_LENGTHS[:30]), PI.DT_ROOT,
                    PI.DT_SIZE, PI._dist_payload, PI.D_INVALID)
            else:
                hlit = br.rd(5) + 257
                hdist = br.rd(5) + 1
                hclen = br.rd(4) + 4
                cl_lens = np.zeros(19, np.int32)
                for i in range(hclen):
                    cl_lens[T.CL_ORDER[i]] = br.rd(3)
                cl, ec = PI.build_table_host(cl_lens, 7, PI.CL_SIZE)
                assert not ec
                lens = np.zeros(hlit + hdist, np.int32)
                i = 0
                while i < hlit + hdist:
                    e = probe(cl, 7, br)
                    s = (e >> 8) & 0x1FF
                    if s < 16:
                        lens[i] = s
                        i += 1
                    elif s == 16:
                        cnt = 3 + br.rd(2)
                        lens[i:i + cnt] = lens[i - 1]
                        i += cnt
                    elif s == 17:
                        i += 3 + br.rd(3)
                    else:
                        i += 11 + br.rd(7)
                lt, e1 = PI.build_table_host(lens[:hlit], PI.LT_ROOT,
                                             PI.LT_SIZE, PI._litlen_payload)
                dt, e2 = PI.build_table_host(lens[hlit:], PI.DT_ROOT,
                                             PI.DT_SIZE, PI._dist_payload,
                                             PI.D_INVALID)
            assert not (e1 or e2), (e1, e2)
            while True:
                sym, length = probe_litlen(lt, br)
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    dist = probe_dist(dt, br)
                    for _ in range(length):
                        out.append(out[-dist])
        if bfinal:
            return bytes(out)


def stage_host():
    rng = np.random.default_rng(0)
    cases = [
        b"hello hello hello world" * 10,
        bytes(rng.integers(0, 256, 5000).astype(np.uint8)),   # incompressible
        bytes((rng.integers(0, 8, 20000) * 31 % 256).astype(np.uint8)),
        bytes(1000),                                          # zeros
        b"a",
        b"",
    ]
    for lvl in (1, 6, 9):
        for i, data in enumerate(cases):
            st = deflate_raw(data, lvl)
            got = host_decode(st)
            assert got == data, f"case {i} lvl {lvl}: MISMATCH"
    print("stage_host: all table/probe oracle cases OK")


def bfinal_at(st, bitoff):
    return (st[bitoff >> 3] >> (bitoff & 7)) & 1


def decode_stream(st):
    """Full-stream decode by chaining kernel calls via end_bit (host reads
    only each block's BFINAL bit)."""
    out, offs = bytearray(), 0
    while True:
        fin = bfinal_at(st, offs)
        o, produced, err, endbit = PI.inflate_blocks(st, [offs])
        if err[0]:
            return bytes(out), True
        out += o[0, :produced[0]].tobytes()
        offs = int(endbit[0])
        if fin:
            return bytes(out), False


def stage_kernel():
    import time
    rng = np.random.default_rng(1)
    cases = {
        "fixed-ish small": b"hello hello hello world" * 10,
        "dynamic text": bytes((rng.integers(0, 8, 20000) * 31 % 256)
                              .astype(np.uint8)),
        "stored": bytes(rng.integers(0, 256, 30000).astype(np.uint8)),
        "zeros 32k": bytes(32000),
    }
    for name, data in cases.items():
        st = deflate_raw(data, 6)
        got, err = decode_stream(st)
        ok = (not err) and got == data
        print(f"kernel stream [{name}]: err={err} "
              f"produced={len(got)}/{len(data)} "
              f"{'OK' if ok else '*** MISMATCH ***'}")
        if not ok and got != data:
            for i in range(min(len(got), len(data))):
                if got[i] != data[i]:
                    print(f"   first mismatch at {i}: "
                          f"got {got[i]:02x} want {data[i]:02x}")
                    break

    # throughput probe: B copies of one block, per block type.
    # NB: foreign (zlib) streams may back-reference across blocks; only
    # block 0 is guaranteed self-contained, so verify a prefix only.
    def zfixed(data):
        c = zlib.compressobj(6, zlib.DEFLATED, -15, 9, zlib.Z_FIXED)
        return c.compress(data) + c.flush()

    probes = {
        "lits": zfixed(bytes(rng.integers(0, 256, 32768)
                             .astype(np.uint8))),
        "rle": deflate_raw(bytes(32768), 6),
        "text": deflate_raw(bytes((rng.integers(0, 64, 32768) * 17 % 256)
                                  .astype(np.uint8)), 6),
    }
    ref_bytes = {}
    for name, st in probes.items():
        o, p, e, _ = PI.inflate_blocks(st, [0])
        assert e[0] == 0, name
        ref_bytes[name] = o[0, :p[0]].tobytes()
    # kernel-only timing: keep inputs on device, fetch only the 4KB
    # status (d2h of the 8MB output would dominate through the tunnel)
    import jax
    import jax.numpy as jnp
    B = 256
    for name, st in probes.items():
        offs = np.zeros(B, np.int64)
        out, produced, err, _ = PI.inflate_blocks(st, offs)
        nb = int(produced[7])
        ok = all(err == 0) and out[7, :nb].tobytes() == ref_bytes[name]

        nbits = len(st) * 8
        start_w = ((offs // 32) // 1024 * 1024).astype(np.int32)
        start_tiles = jnp.asarray((start_w // 1024).astype(np.int32))
        bit0 = jnp.asarray((offs - 32 * start_w.astype(np.int64))
                           .astype(np.int32))
        avail = jnp.asarray(np.minimum(
            nbits - 32 * start_w.astype(np.int64),
            (PI.IN_W - 3) * 32).astype(np.int32))
        pad = (-len(st)) % 4
        words = np.frombuffer(st + b"\x00" * pad, np.uint8).view(np.int32)
        words = jnp.asarray(
            np.concatenate([words, np.zeros(PI.IN_W, np.int32)]))
        statics = jnp.asarray(PI.make_statics())
        grid = B // PI.K

        def once():
            o, s = PI._inflate_blocks_jit(words, start_tiles, bit0, avail,
                                          statics, grid=grid)
            return s

        s = once()
        int(np.asarray(s[0, 0]))              # warm + sync
        reps = 4
        t0 = time.perf_counter()
        for _ in range(reps):
            s = once()                        # async enqueue
        int(np.asarray(s[0, 0]))              # force completion, tiny d2h
        dt2 = (time.perf_counter() - t0) / reps
        mbps = int(np.sum(produced.astype(np.int64))) / dt2 / 1e6
        print(f"kernel B={B} [{name}] (K={PI.K}): kern={dt2*1e3:.1f}ms "
              f"blk={nb}B -> {mbps:.1f} MB/s "
              f"{'OK' if ok else '*** MISMATCH ***'}")


if __name__ == "__main__":
    if "host" in sys.argv:
        stage_host()
    if "kernel" in sys.argv:
        stage_kernel()
