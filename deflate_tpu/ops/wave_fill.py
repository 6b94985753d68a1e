"""Stage G of the wavefront decoder: LZ match fill on the scalar core.

After ops/wave.py places literal bytes and compacts per-block match
records (opos | (len-3)<<16, dist), this kernel performs the only
inherently sequential step — copying match bytes, which may reference
bytes produced by earlier matches (reference analog: the backref copy
loop at inflate.hpp:284-305).  Work is bounded by match BYTES / 8 per
iteration (word-group copies with RFC-overlap handling), not by symbol
count; literal-heavy blocks cost almost nothing here.

Records are interleaved [B, 2*NM] (rec0, rec1 pairs); NM is a multiple
of 1024 so per-window DMA source offsets stay Mosaic-tile aligned.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deflate_tpu.ops.wave import NM, ND

OW = ND // 4                 # output words per block
RW = 2048                    # match records per SMEM window


def _kernel(nm_ref, lit_ref, rec_ref, out_ref, outw, recs,
            sem_in, sem_rec, sem_out):
    g = pl.program_id(0)
    i32 = jnp.int32

    def srl(x, n):
        return jax.lax.shift_right_logical(x, n)

    cp_in = pltpu.make_async_copy(
        lit_ref.at[pl.ds(g * OW, OW)], outw.at[pl.ds(0, OW)], sem_in)
    cp_in.start()
    nm = nm_ref[g]
    cp_in.wait()

    def funnel_out(p):
        wi = srl(p, 2)
        sh = (p & 3) * 8
        a = outw[wi]
        b = outw[wi + 1]
        return jnp.where(sh == 0, a, srl(a, sh) | (b << (32 - sh)))

    def wr_group4(p, w, m):
        wi = srl(p, 2)
        sh = (p & 3) * 8
        ma = m << sh
        va = w << sh
        mb = jnp.where(sh == 0, i32(0), srl(m, 32 - sh))
        vb = jnp.where(sh == 0, i32(0), srl(w, 32 - sh))
        a = outw[wi]
        outw[wi] = (a & ~ma) | (va & ma)
        b = outw[wi + 1]
        outw[wi + 1] = (b & ~mb) | (vb & mb)

    def rot3(w):
        return srl(w, 8) | ((srl(w, 8) & 0xFF) << 24)

    def do_window(wi, _):
        base = g * 2 * NM + wi * 2 * RW
        cp = pltpu.make_async_copy(
            rec_ref.at[pl.ds(base, 2 * RW)], recs.at[pl.ds(0, 2 * RW)],
            sem_rec)
        cp.start()
        cp.wait()
        lim = jnp.minimum(nm - wi * RW, RW)

        def do_match(m, _):
            r0 = recs[2 * m]
            dist = recs[2 * m + 1]
            opos = r0 & 0xFFFF
            length = (srl(r0, 16) & 255) + 3

            def cond(c):
                return c[1] > 0

            def body(c):
                p, rem = c
                eff = jnp.minimum(rem, i32(8))
                pb = p - dist
                w0 = funnel_out(pb)
                bb = w0 & 0xFF
                rep1 = bb | (bb << 8) | (bb << 16) | (bb << 24)
                hh = w0 & 0xFFFF
                patw = jnp.where(
                    dist == 1, rep1,
                    jnp.where(dist == 2, hh | (hh << 16),
                              (w0 & 0xFFFFFF) | (bb << 24)))
                v0 = jnp.where(dist < 4, patw, w0)
                m0 = jnp.where(eff >= 4, i32(-1),
                               (i32(1) << (8 * eff)) - 1)
                m1 = jnp.where(eff <= 4, i32(0),
                               jnp.where(eff >= 8, i32(-1),
                                         (i32(1) << (8 * (eff - 4))) - 1))
                # first group write, then re-read for the second group
                # (correct for 4<=dist<8 overlap); dist<4 uses patterns
                wr_group4(p, v0, m0)
                w1f = funnel_out(p + 4 - dist)
                v1 = jnp.where(dist == 3, rot3(patw),
                               jnp.where(dist < 4, patw, w1f))
                wr_group4(p + 4, v1, m1)
                return p + eff, rem - eff

            jax.lax.while_loop(cond, body, (opos, length))
            return 0

        jax.lax.fori_loop(0, lim, do_match, 0)
        return 0

    jax.lax.fori_loop(0, (nm + RW - 1) // RW, do_window, 0)

    cp_out = pltpu.make_async_copy(
        outw.at[pl.ds(0, OW)], out_ref.at[pl.ds(g * OW, OW)], sem_out)
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("B", "interpret"))
def fill_matches(litwords, recs, nmatch, B: int, interpret: bool = False):
    """litwords [B, OW] int32, recs [B, 2*NM] interleaved, nmatch [B].
    Returns filled words [B, OW]."""
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.SMEM((OW + 8,), jnp.int32),
            pltpu.SMEM((2 * RW,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((B * OW,), jnp.int32),
        interpret=interpret,
    )(nmatch, litwords.reshape(-1), recs.reshape(-1))
    return out.reshape(B, OW)
