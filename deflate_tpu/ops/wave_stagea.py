"""Pallas kernel for wavefront stage A (per-bit-position decode).

The XLA formulation (wave.decode_positions) materializes the [B, 64,
W64] peek windows and the compare rounds' intermediates through HBM —
~14 ms of the 64-block text decode budget for ~2 ns/position against a
~0.6 ns/position fused-VPU floor (CLAUDE.md cost model).  Here a
(block, column-tile) grid builds the peeks in VMEM with per-row funnel
shifts (row p of a tile = bit phase p) and runs the entire 15+15-round
canonical decode (wave.decode_core) without leaving VMEM; HBM sees only
the window words in and the packed A0/P1 out.

Per-block canonical-decode scalars (first/lim per code length, class
boundaries, membership masks) ride SMEM as one stacked [7, 16] int32
table read by decode_core's getter.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deflate_tpu.ops import wave as W

MD_KEYS = ("l_lim", "l_first", "l_meta", "l_mask",
           "d_lim", "d_first", "d_mask")


def stack_md(md) -> jax.Array:
    """Stack the decode_core scalar tables into one [B, 7, 16] int32
    array for the kernel's SMEM operand (all entries fit int32: limits/
    first codes <= 2^15, membership masks <= 30 bits)."""
    return jnp.stack([md[k].astype(jnp.int32) for k in MD_KEYS], axis=1)


def _kernel(we_ref, wo_ref, w2_ref, w3_ref, md_ref, a0_ref, p1_ref,
            *, TW: int):
    srl = jax.lax.shift_right_logical
    we, wo = we_ref[0], wo_ref[0]          # [1, TW] each
    w2, w3 = w2_ref[0], w3_ref[0]
    p = jax.lax.broadcasted_iota(jnp.int32, (64, TW), 0)
    pm = p & 31
    sel = p >= 32
    b0 = jnp.where(sel, wo, we)
    b1 = jnp.where(sel, w2, wo)
    b2 = jnp.where(sel, w3, w2)
    pmc = jnp.where(pm == 0, 1, pm)          # keep shifts in 1..31
    PK = jnp.where(pm == 0, b0, srl(b0, pmc) | (b1 << (32 - pmc)))
    PKH = jnp.where(pm == 0, b1, srl(b1, pmc) | (b2 << (32 - pmc)))

    ki = {k: i for i, k in enumerate(MD_KEYS)}

    def g(key, l):
        return md_ref[0, ki[key], l]

    A0, P1 = W.decode_core(PK, PKH, g)
    a0_ref[0] = A0
    p1_ref[0] = P1


@functools.partial(jax.jit, static_argnames=("W64", "interpret"))
def decode_positions_pallas(nwords, md, W64: int,
                            interpret: bool = False):
    """Drop-in for wave.decode_positions: A0, P1 each [B, 64, W64]."""
    B = nwords.shape[0]
    TW = next(t for t in (512, 256, 128) if W64 % t == 0)
    # Inputs carried as [B, 1, W64]: Mosaic requires each block's last
    # two dims be (mult of 8, mult of 128) OR equal to the array dims —
    # a (1, 1, TW) block over [B, 1, W64] satisfies it (1 == 1, TW%128
    # == 0), whereas a (1, TW) block over [B, W64] does not for B > 1.
    we = nwords[:, 0:2 * W64:2][:, None, :]
    wo = nwords[:, 1:2 * W64 + 1:2][:, None, :]
    w2 = nwords[:, 2:2 * W64 + 2:2][:, None, :]
    w3 = nwords[:, 3:2 * W64 + 3:2][:, None, :]
    mds = stack_md(md)

    ws = pl.BlockSpec((1, 1, TW), lambda b, j: (b, 0, j),
                      memory_space=pltpu.VMEM)
    ms = pl.BlockSpec((1, len(MD_KEYS), 16), lambda b, j: (b, 0, 0),
                      memory_space=pltpu.SMEM)
    os_ = pl.BlockSpec((1, 64, TW), lambda b, j: (b, 0, j),
                       memory_space=pltpu.VMEM)
    A0, P1 = pl.pallas_call(
        functools.partial(_kernel, TW=TW),
        grid=(B, W64 // TW),
        in_specs=[ws, ws, ws, ws, ms],
        out_specs=[os_, os_],
        out_shape=[jax.ShapeDtypeStruct((B, 64, W64), jnp.int32)] * 2,
        interpret=interpret,
    )(we, wo, w2, w3, mds)
    return A0, P1
