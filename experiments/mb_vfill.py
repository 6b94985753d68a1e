"""Microbench: per-match cost of a VECTOR (VMEM) match-fill iteration.

Question: can the fill kernel leave the scalar core?  A match copy is
<=258 bytes; with the output block VMEM-resident as [rows, 128] int32
(512-B rows), one match = load 2 dynamic rows, byte-align via dynamic
roll + funnel, masked RMW of 2 dest rows.  If that loop runs at <~45
cycles/match it beats the measured ~88 cy/match scalar loop AND kills
the SMEM DMA floor (operands ride normal Pallas VMEM blocks).

Variants:
  v1: full per-match vector RMW (dynamic rows, dynamic roll, masks)
  v2: dynamic row load/store only (no roll/mask) — floor of the idea
  v3: scalar SMEM minimal loop — floor of the current design
"""
import functools
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 4096          # matches per block-kernel
ROWS = 66         # 64 rows of 512 B (32 KiB) + 2 pad
REPS = 64         # blocks' worth of work per launch (grid)


def _v1_kernel(rec_ref, out_ref, scratch, acc):
    i32 = jnp.int32

    def srl(x, n):
        return jax.lax.shift_right_logical(x, n)

    def body(m, _):
        p = rec_ref[2 * m]          # dest byte pos
        d = rec_ref[2 * m + 1]      # distance
        L = i32(16)
        s = p - d
        r0 = srl(s, 9)
        rd = srl(p, 9)
        so = s & 511
        to = p & 511
        # load 2 src rows -> [2,128] -> flat [1,256]
        x = scratch[pl.ds(r0, 2), :].reshape(1, 256)
        # word-align: rotate by kw words (dynamic)
        kb = (to - so) & 1023
        kw = srl(kb, 2)
        bb = (kb & 3) * 8
        y = pltpu.roll(x, shift=kw, axis=1)
        y1 = pltpu.roll(x, shift=kw + 1, axis=1)
        z = jnp.where(bb == 0, y, (srl(y, bb) | (y1 << (32 - bb))))
        # byte mask for dest [to, to+L) over 1024 B
        widx = jax.lax.broadcasted_iota(i32, (1, 256), 1) * 4
        b0 = widx
        lo = jnp.maximum(to - b0, 0)
        hi = jnp.minimum(to + L - b0, 4)
        nby = jnp.clip(hi - lo, 0, 4)
        mask = jnp.where(nby >= 4, i32(-1),
                         ((i32(1) << (8 * nby)) - 1) << (8 * lo))
        dst = scratch[pl.ds(rd, 2), :].reshape(1, 256)
        merged = (dst & ~mask) | (z & mask)
        scratch[pl.ds(rd, 2), :] = merged.reshape(2, 128)
        return 0

    jax.lax.fori_loop(0, M, body, 0)
    out_ref[:] = scratch[:64, :]
    acc[0] = 0


def _v2_kernel(rec_ref, out_ref, scratch, acc):
    def srl(x, n):
        return jax.lax.shift_right_logical(x, n)

    def body(m, _):
        p = rec_ref[2 * m]
        d = rec_ref[2 * m + 1]
        r0 = srl(p - d, 9)
        rd = srl(p, 9)
        x = scratch[pl.ds(r0, 2), :]
        dst = scratch[pl.ds(rd, 2), :]
        scratch[pl.ds(rd, 2), :] = dst ^ x
        return 0

    jax.lax.fori_loop(0, M, body, 0)
    out_ref[:] = scratch[:64, :]
    acc[0] = 0


def _v3_kernel(rec_ref, out_ref, scratch, acc):
    # scalar floor: per match, 2 rec loads + 2 src loads + 2 RMW words
    i32 = jnp.int32

    def srl(x, n):
        return jax.lax.shift_right_logical(x, n)

    def body(m, t):
        p = rec_ref[2 * m]
        d = rec_ref[2 * m + 1]
        w = srl(p - d, 2)
        a = acc_s[w]
        b = acc_s[w + 1]
        wd = srl(p, 2)
        acc_s[wd] = a ^ b
        acc_s[wd + 1] = a + b
        return t

    acc_s = scratch
    jax.lax.fori_loop(0, M, body, jnp.int32(0), unroll=True)
    out_ref[:] = jnp.zeros_like(out_ref)
    acc[0] = 0


def run(name, kern, smem_scratch=False):
    rng = np.random.default_rng(0)
    p = rng.integers(2048, 32000, M).astype(np.int32)
    d = rng.integers(1, 1024, M).astype(np.int32)
    recs = np.stack([p, d], 1).ravel()

    scratch = (pltpu.SMEM((ROWS * 128,), jnp.int32) if smem_scratch
               else pltpu.VMEM((ROWS, 128), jnp.int32))
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(REPS,),
            in_specs=[],
            out_specs=pl.BlockSpec((64, 128), lambda g, *_: (0, 0)),
            scratch_shapes=[scratch, pltpu.SMEM((8,), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
    )
    fj = jax.jit(lambda r: f(r))
    r = jnp.asarray(recs)
    out = fj(r)
    int(jnp.sum(out[0, :1]))
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        out = fj(r)
    int(jnp.sum(out[0, :1]))
    dt = (time.perf_counter() - t0) / n
    per = dt / (M * REPS)
    print(f"{name:28s} {dt*1e3:8.2f} ms  {per*1e9:7.1f} ns/match "
          f"(~{per*0.94e9:5.0f} cy)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["v2", "v1", "v3"]
    if "v2" in which:
        run("v2 dyn-row RMW only", _v2_kernel)
    if "v1" in which:
        run("v1 full vector match", _v1_kernel)
    if "v3" in which:
        run("v3 scalar SMEM floor", _v3_kernel, smem_scratch=True)
