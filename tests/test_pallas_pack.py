"""Pallas bit-pack kernel (ops/pallas_pack.py) differential tests.

The kernel replaces the encoder's scatter placement on TPU; interpret
mode runs the identical traced program on CPU.  Both backends must
produce bit-identical block words from the same packet lists.
"""
import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deflate_tpu.models import encoder as E
from deflate_tpu.ops import pallas_pack as PK
from deflate_tpu.runtime import stitch as S
from deflate_tpu.utils.tables import BLOCK_SIZE


def _mk_blocks():
    rng = np.random.default_rng(17)
    datas = [
        rng.integers(97, 123, BLOCK_SIZE, dtype=np.uint8).tobytes(),  # text
        (b"0123456789abcdef" * 2048),                          # periodic
        rng.integers(0, 256, BLOCK_SIZE, dtype=np.uint8).tobytes(),  # stored
        b"short tail block" * 6,                               # partial
    ]
    B = len(datas)
    blocks = np.zeros((B, BLOCK_SIZE), np.uint8)
    blens = np.zeros((B,), np.int32)
    for i, d in enumerate(datas):
        d = d[:BLOCK_SIZE]
        blocks[i, :len(d)] = np.frombuffer(d, np.uint8)
        blens[i] = len(d)
    return blocks, blens


@pytest.mark.slow
def test_kernel_matches_scatter_interpret():
    """Kernel placement (interpret mode) == scatter placement, bit-exact,
    across dynamic/fixed/stored/partial blocks, and the stream round-trips
    through zlib."""
    blocks_np, blens_np = _mk_blocks()
    B = blocks_np.shape[0]
    blocks = jnp.asarray(blocks_np)
    blens = jnp.asarray(blens_np)
    live = jnp.ones((B,), bool)
    level = 2

    plans = jax.vmap(lambda b, l: E.block_plan(b, l, level))(blocks, blens)
    choice, pad, offset, bits = E.choose_blocks(
        plans["fixed_bits"], plans["dyn_bits"], blens, live, level,
        jnp.int32(0))
    bfinal = jnp.arange(B) == B - 1

    # scatter backend
    w_sc = jax.vmap(
        lambda bl, ln, i, ch, pd, bf: E.emit_block(
            bl, ln, jax.tree.map(lambda x: x[i], plans), ch, pd, bf)
    )(blocks, blens, jnp.arange(B), choice, pad, bfinal)

    # kernel backend (interpret)
    offp, lop, hip, counts, nbitsp, storedv = jax.vmap(
        lambda bl, ln, i, ch, pd, bf: E.build_packets(
            bl, ln, jax.tree.map(lambda x: x[i], plans), ch, pd, bf)
    )(blocks, blens, jnp.arange(B), choice, pad, bfinal)
    w_k = PK.pack_blocks(counts, offp, lop, hip, interpret=True)[:, :E.WB]
    w_k = jax.vmap(E._finish_block)(w_k, blocks, blens, storedv, pad,
                                    nbitsp)

    assert bool(jnp.all(w_sc == w_k)), "kernel placement != scatter"

    # and the assembled stream round-trips
    base = (offset >> 5).astype(jnp.int32)
    s = (offset & 31).astype(jnp.uint32)
    prev = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.uint32), w_k[:, :-1]], 1)
    sh = s[:, None]
    shifted = (w_k << sh) | jnp.where(sh == 0, jnp.uint32(0),
                                      prev >> (jnp.uint32(32) - sh))
    tail = jnp.where(s == 0, jnp.uint32(0),
                     w_k[:, -1] >> (jnp.uint32(32) - s))
    tgt = base[:, None] + jnp.arange(E.WB, dtype=jnp.int32)[None, :]
    out = jnp.zeros((B * E.WB,), jnp.uint32)
    out = out.at[tgt.reshape(-1)].add(shifted.reshape(-1), mode="drop")
    out = out.at[base + E.WB].add(tail, mode="drop")
    enc = S.words_to_bytes(np.asarray(out), int(jnp.sum(bits)))
    want = b"".join(blocks_np[i, :blens_np[i]].tobytes() for i in range(B))
    assert zlib.decompress(enc, -15) == want
