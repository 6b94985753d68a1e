"""Pallas kernel for monotone log-shift routing (ops/wave.py contract).

The XLA formulation materializes every round's shifted arrays through
HBM (~20 ms for 18 rounds x 3 arrays x [64, 164K] — the single largest
wavefront-decode stage).  Here each block's payloads + displacement live
in VMEM for all rounds; HBM is touched once in and once out.

Layout: the routed axis L (a multiple of 8*128) is viewed as [8, L/8]
row-major so the VPU runs at full sublane occupancy.  A flat shift by
+s becomes: roll lanes by s%L8, roll sublanes by s//L8, and select the
one-extra-row variant for wrapped columns; the wrapped tail is masked
via the displacement pad (-1), so circular wrap never leaks data.

Semantics and collision-freedom proof: see route_monotone_left /
route_monotone_right in ops/wave.py (LSB-first for leftward moves,
MSB-first for rightward).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_flat(x, s: int, L8: int, left: bool):
    """x viewed flat [8*L8]: return x[i + s] (left) or x[i - s] (right);
    out-of-range positions contain circular garbage — callers mask via
    the displacement pad."""
    q, rr = divmod(s, L8)
    if left:                     # pltpu.roll requires non-negative shifts
        a = x if rr == 0 else pltpu.roll(x, L8 - rr, axis=1)
        v0 = a if q == 0 else pltpu.roll(a, (8 - q) % 8, axis=0)
        v1 = pltpu.roll(v0, 7, axis=0)
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where(col < L8 - rr, v0, v1)
    a = x if rr == 0 else pltpu.roll(x, rr, axis=1)
    v0 = a if q == 0 else pltpu.roll(a, q, axis=0)
    v1 = pltpu.roll(v0, 1, axis=0)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col >= rr, v0, v1)


def _mk_kernel(P: int, rounds: int, L8: int, left: bool):
    def kernel(*refs):
        pays = [refs[i][0] for i in range(P)]
        d = refs[P][0]
        row = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        flat = row * L8 + col
        L = 8 * L8
        ks = range(rounds) if left else reversed(range(rounds))
        for k in ks:
            s = 1 << k
            ds = _shift_flat(d, s, L8, left)
            edge = (flat >= L - s) if left else (flat < s)
            ds = jnp.where(edge, -1, ds)
            inc = (ds >= 0) & (((ds >> k) & 1) > 0)
            out = (d >= 0) & (((d >> k) & 1) > 0)
            pays = [jnp.where(inc, _shift_flat(p, s, L8, left), p)
                    for p in pays]
            d = jnp.where(inc, ds - s, jnp.where(out, -1, d))
        for i in range(P):
            refs[P + 1 + i][0] = pays[i]
        refs[2 * P + 1][0] = d
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("rounds", "left", "interpret"))
def _route_call(payloads, delta, rounds: int, left: bool,
                interpret: bool = False):
    B, L = delta.shape
    assert L % 1024 == 0, L
    L8 = L // 8
    P = len(payloads)
    args = [p.reshape(B, 8, L8) for p in payloads]
    args.append(delta.reshape(B, 8, L8))
    bs = pl.BlockSpec((1, 8, L8), lambda b: (b, 0, 0),
                      memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _mk_kernel(P, rounds, L8, left),
        grid=(B,),
        in_specs=[bs] * (P + 1),
        out_specs=[bs] * (P + 1),
        out_shape=[jax.ShapeDtypeStruct((B, 8, L8), jnp.int32)] * (P + 1),
        input_output_aliases={i: i for i in range(P + 1)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return ([o.reshape(B, L) for o in outs[:P]], outs[P].reshape(B, L))


def route_pallas(payloads, delta, rounds: int, left: bool = True,
                 interpret: bool = False):
    """Drop-in for wave.route_monotone_left/right on TPU shapes whose
    routed axis is a multiple of 1024."""
    return _route_call(tuple(payloads), delta, rounds, left, interpret)
