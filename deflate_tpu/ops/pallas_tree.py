"""Pallas TPU Huffman-tree kernel: batched two-queue merges on the scalar core.

Reference analog: ``generateCodeLengths`` (common.hpp:322-404) — a
std::priority_queue build per tree on the CPU.  The XLA formulation
(ops/huffman._depths_two_queue) is algorithmically right but each of the
~285 sequential merge steps costs a handful of vmapped dynamic-index
ops over the whole batch — ~50 ms of a 250 ms 8 MiB encode on v5e,
for arrays of 286 elements.

Here each grid cell runs K=4 independent trees' merges interleaved on
the scalar core (~30 ops per merge step per tree), bounded by the actual
used-symbol count nz, with callers bucketing trees by descending nz so a
cell's chains finish together.  ~7 us per 286-symbol tree vs ~200 us.

Tie-breaks match _depths_two_queue exactly (prefer the leaf queue on
equal weights), so kernel and XLA backends produce identical lengths.

I/O contract (built by ops/huffman.huffman_lengths_batch):
  lw  int32 [T, NW]  leaf weights sorted ascending, INF past nz
  nz  int32 [T]      used-symbol count (scalar-prefetched)
  out int32 [T, NW]  [0:512)   depth of the i-th sorted leaf (i < nz)
                     [512:1024) internal-node depths (k < nz-1)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NW = 1024                 # words per tree slot (DMA-aligned)
NMAX = 512                # max leaves per tree
K = 4                     # interleaved trees per grid cell
INF = 1 << 28
TRASH = NMAX              # guarded stores land here (slot NMAX is spare)


def _kernel(nz_ref, lw_ref, out_ref,
            lws, outs, iws, lpars, ipars, sems_in, sems_out):
    g = pl.program_id(0)
    i32 = jnp.int32

    cps = []
    for j in range(K):
        cp = pltpu.make_async_copy(
            lw_ref.at[pl.ds((g * K + j) * NW, NW)], lws[j], sems_in[j])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    nzs = [nz_ref[g * K + j] for j in range(K)]
    nzmax = nzs[0]
    for j in range(1, K):
        nzmax = jnp.maximum(nzmax, nzs[j])

    for j in range(K):
        iw, out, lpar, ipar = iws[j], outs[j], lpars[j], ipars[j]

        def init8(t, _):
            for u in range(8):
                iw[8 * t + u] = i32(INF)
                out[8 * t + u] = i32(0)
                out[NMAX + 8 * t + u] = i32(0)
                lpar[8 * t + u] = i32(0)
                ipar[8 * t + u] = i32(0)
            return 0
        jax.lax.fori_loop(0, NMAX // 8, init8, 0)

    # ---- interleaved two-queue merges -----------------------------------
    def merge(k, st):
        st2 = []
        for j in range(K):
            li, ii = st[j]
            lw, iw, lpar, ipar = lws[j], iws[j], lpars[j], ipars[j]
            act = k < nzs[j] - 1
            for _pick in range(2):
                wl = lw[li]
                wi = iw[ii]
                tl = act & (wl <= wi)
                ti = act & (wl > wi)
                lpar[jnp.where(tl, li, i32(TRASH))] = k
                ipar[jnp.where(ti, ii, i32(TRASH))] = k
                if _pick == 0:
                    w1 = jnp.where(tl, wl, wi)
                else:
                    iw[jnp.where(act, k, i32(TRASH))] = w1 + \
                        jnp.where(tl, wl, wi)
                li = li + tl.astype(i32)
                ii = ii + ti.astype(i32)
            st2.append((li, ii))
        return tuple(st2)

    jax.lax.fori_loop(0, nzmax - 1, merge,
                      tuple((i32(0), i32(0)) for _ in range(K)))

    # ---- internal depths, reverse creation order ------------------------
    def depth(k, _):
        for j in range(K):
            out, ipar = outs[j], ipars[j]
            nint = nzs[j] - 1
            kk = nint - 1 - k
            act = kk >= 0
            kk_s = jnp.where(act, kk, i32(0))
            d = jnp.where(kk_s == nint - 1, i32(0),
                          out[NMAX + jnp.minimum(ipar[kk_s],
                                                 i32(NMAX - 1))] + 1)
            out[jnp.where(act, NMAX + kk_s, i32(2 * NMAX))] = d
        return 0
    jax.lax.fori_loop(0, nzmax - 1, depth, 0)

    # ---- leaf depths: one lookup per sorted leaf -------------------------
    def leafd(i, _):
        for j in range(K):
            out, lpar = outs[j], lpars[j]
            act = i < nzs[j]
            d = out[NMAX + jnp.minimum(lpar[jnp.where(act, i, i32(TRASH))],
                                       i32(NMAX - 1))] + 1
            out[jnp.where(act, i, i32(2 * NMAX))] = d
        return 0
    jax.lax.fori_loop(0, nzmax, leafd, 0)

    cps = []
    for j in range(K):
        cp = pltpu.make_async_copy(
            outs[j].at[pl.ds(0, NW)],
            out_ref.at[pl.ds((g * K + j) * NW, NW)], sems_out[j])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()


@functools.partial(jax.jit, static_argnames=("grid", "interpret"))
def _trees_jit(nz, lw, grid: int, interpret: bool = False):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            [pltpu.SMEM((NW,), jnp.int32) for _ in range(K)],   # lw
            # out: [0:512) leaf depths, [512:1024) internal, +pad for the
            # 2*NMAX trash slot used by guarded stores
            [pltpu.SMEM((NW + 8,), jnp.int32) for _ in range(K)],
            [pltpu.SMEM((NMAX + 8,), jnp.int32) for _ in range(K)],  # iw
            [pltpu.SMEM((NMAX + 8,), jnp.int32) for _ in range(K)],  # lpar
            [pltpu.SMEM((NMAX + 8,), jnp.int32) for _ in range(K)],  # ipar
            [pltpu.SemaphoreType.DMA] * K,
            [pltpu.SemaphoreType.DMA] * K,
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((grid * K * NW,), jnp.int32),
        interpret=interpret,
    )(nz, lw)


def depths_batch(lw, nz, interpret: bool = False):
    """Batched Huffman depths for T trees.

    lw: int32 [T, n] sorted leaf weights (INF past nz); nz: int32 [T].
    Returns (sorted_leaf_depth [T, n], idepth [T, n]) matching
    ops/huffman._depths_two_queue.  Trees are bucketed by descending nz
    so interleaved cells finish together.
    """
    T, n = lw.shape
    assert n <= NMAX
    gridT = -(-T // K) * K
    padT = gridT - T
    lw_p = jnp.full((gridT, NW), jnp.int32(INF), jnp.int32)
    lw_p = lw_p.at[:T, :n].set(lw.astype(jnp.int32))
    nz_p = jnp.concatenate(
        [nz.astype(jnp.int32), jnp.zeros((padT,), jnp.int32)]) \
        if padT else nz.astype(jnp.int32)
    order = jnp.argsort(-nz_p)
    inv = jnp.argsort(order)
    out = _trees_jit(nz_p[order], lw_p[order].reshape(-1),
                     grid=gridT // K, interpret=interpret)
    out = out.reshape(gridT, NW)[inv][:T]
    return out[:, :n], out[:, NMAX:NMAX + n]
