"""Pallas TPU bit-pack kernel: place variable-width packets in a bitstream.

Reference analog: ``Bitwrapper::addBits`` (deflate.hpp:80-159) — the
reference appends bits one token at a time on the CPU.  The XLA
formulation (ops/bitpack.py + the encoder's pair-fused scatter) computes
all packet offsets in parallel but pays ~20 ns per scatter lane on v5e —
measured 462 ms of a 647 ms 8 MiB encode, the single hottest stage.

This kernel keeps the parallel XLA planning (offsets via cumsum, packet
payloads via the sort-based table apply) and replaces ONLY the placement:
the scalar core walks each block's compacted packet list and ORs each
<=48-bit payload into an SMEM word buffer (3 read-modify-write stores +
one funnel shift per packet, ~15 ops).  K blocks are interleaved per grid
cell so their dependent store chains pipeline; callers bucket blocks by
packet count so a cell's chains finish together.

Packets are compacted (dead lanes sorted to the tail in XLA, where sorts
cost ~0.6 ns/element) and every packet past a block's count has zero
payload, so over-iterating a short block inside a cell writes nothing —
the loop needs no per-block masking.

Layout contract (built by models/encoder.build_packets):
  off[i]  bit offset of packet i within the block-local stream
          (monotone nondecreasing incl. the zero-payload tail)
  lo[i]   payload bits 0..31   (bits beyond the packet width are zero)
  hi[i]   payload bits 32..47
  count   live packets (header entries + tokens + EOB)
Arrays are [B, NPK] flattened to [B*NPK]; NPK and the per-block output
word count OUTW are 1024-word aligned (Mosaic DMA tiling).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# max packets per block: 4 preamble + 654 dynamic-header entries
# + 32768 tokens + 1 EOB = 33427 -> next multiple of 1024
NPK = 33 * 1024
CHUNK = 1024              # packets DMA'd per inner round
OUTW = 9 * 1024           # output words per block (>= encoder WB = 8195)
K = 4                     # interleaved blocks per grid cell


def _kernel(counts_ref,                          # scalar prefetch
            off_ref, lo_ref, hi_ref,             # inputs (ANY)
            out_ref,                             # output (ANY)
            outws, boffs, blos, bhis,            # SMEM scratch (K each)
            sems_in, sems_out):
    g = pl.program_id(0)
    i32 = jnp.int32
    srl = jax.lax.shift_right_logical

    cmax = counts_ref[g * K]
    for j in range(1, K):
        cmax = jnp.maximum(cmax, counts_ref[g * K + j])

    for j in range(K):
        outw = outws[j]

        def z8(t, _):
            for u in range(8):
                outw[8 * t + u] = i32(0)
            return 0
        jax.lax.fori_loop(0, OUTW // 8, z8, 0)

    nch = srl(cmax + (CHUNK - 1), 10)

    def chunk(c, _):
        cps = []
        for j in range(K):
            base = (g * K + j) * NPK + c * CHUNK
            for r, b, s in ((off_ref, boffs[j], 0), (lo_ref, blos[j], 1),
                            (hi_ref, bhis[j], 2)):
                cp = pltpu.make_async_copy(r.at[pl.ds(base, CHUNK)], b,
                                           sems_in[3 * j + s])
                cp.start()
                cps.append(cp)
        for cp in cps:
            cp.wait()
        m = jnp.minimum(i32(CHUNK), cmax - c * CHUNK)

        def pk(i, _):
            for j in range(K):
                outw = outws[j]
                off = boffs[j][i]
                lo = blos[j][i]
                hi = bhis[j][i]
                w = srl(off, 5)
                r = off & 31
                nr = 32 - jnp.maximum(r, 1)
                a = lo << r
                b = jnp.where(r == 0, hi, srl(lo, nr) | (hi << r))
                c2 = jnp.where(r == 0, i32(0), srl(hi, nr))
                outw[w] = outw[w] | a
                outw[w + 1] = outw[w + 1] | b
                outw[w + 2] = outw[w + 2] | c2
            return 0
        jax.lax.fori_loop(0, m, pk, 0)
        return 0
    jax.lax.fori_loop(0, nch, chunk, 0)

    cps = []
    for j in range(K):
        cp = pltpu.make_async_copy(
            outws[j].at[pl.ds(0, OUTW)],
            out_ref.at[pl.ds((g * K + j) * OUTW, OUTW)], sems_out[j])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()


@functools.partial(jax.jit, static_argnames=("grid", "interpret"))
def _pack_jit(counts, off, lo, hi, grid: int, interpret: bool = False):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            [pltpu.SMEM((OUTW,), jnp.int32) for _ in range(K)],
            [pltpu.SMEM((CHUNK,), jnp.int32) for _ in range(K)],
            [pltpu.SMEM((CHUNK,), jnp.int32) for _ in range(K)],
            [pltpu.SMEM((CHUNK,), jnp.int32) for _ in range(K)],
            [pltpu.SemaphoreType.DMA] * (3 * K),
            [pltpu.SemaphoreType.DMA] * K,
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((grid * K * OUTW,), jnp.int32),
        interpret=interpret,
    )(counts, off, lo, hi)
    return out


def pack_blocks(counts, off, lo, hi, interpret: bool = False):
    """Pack B blocks' packet lists into per-block word buffers.

    counts: int32 [B]; off/lo/hi: int32 [B, NPK].
    Returns uint32 [B, OUTW] (block-local bit offsets, word 0 = bit 0).

    Blocks are bucketed by descending packet count so each K-cell's
    interleaved chains have similar lengths (a stored block sharing a
    cell with a 33k-token text block would otherwise idle-spin).
    """
    B = counts.shape[0]
    gridB = -(-B // K) * K
    padB = gridB - B
    if padB:
        counts = jnp.concatenate([counts, jnp.zeros((padB,), jnp.int32)])
        z = jnp.zeros((padB, NPK), jnp.int32)
        off = jnp.concatenate([off, z])
        lo = jnp.concatenate([lo, z])
        hi = jnp.concatenate([hi, z])
    order = jnp.argsort(-counts)                 # descending count
    inv = jnp.argsort(order)
    out = _pack_jit(counts[order],
                    off[order].reshape(-1), lo[order].reshape(-1),
                    hi[order].reshape(-1),
                    grid=gridB // K, interpret=interpret)
    out = out.reshape(gridB, OUTW)[inv][:B]
    return jax.lax.bitcast_convert_type(out, jnp.uint32)
