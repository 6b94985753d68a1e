"""Data-parallel DEFLATE over a JAX device mesh.

The reference is single-threaded (SURVEY.md §2.7); its one parallelizable
property is quirk Q5 — encoded blocks are fully independent.  That maps onto
a TPU slice as pure data parallelism over mesh axis ``data``:

  stage A  (sharded)    per-block LZ77 parse + histograms + trees + sizes
  stage B  (replicated) all_gather the per-block candidate *sizes* (a few
                        bytes per block) and run the exact block-type /
                        bit-offset scan on every device — the only serial
                        dependency in DEFLATE encode is this integer scan
  stage C  (sharded)    emit each block's chosen encoding locally
  stage D  (collective) every device scatters its blocks' words at their
                        global bit offsets into a zero buffer; one psum over
                        ``data`` yields the finished bitstream (disjoint bits,
                        so add == or).

TP/PP/EP have no analog here (nothing matrix- or expert-shaped exists in a
codec — SURVEY.md §2.7); DP over blocks plus the offset-scan collective is
the complete parallelism story.  Collectives are all_gather + psum on the
``data`` axis and ride ICI inside a slice.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from deflate_tpu.models import encoder as E

AXIS = "data"


def make_mesh(devices=None, axis: str = AXIS) -> Mesh:
    """A 1-D mesh over the given (default: all) devices."""
    import numpy as np

    devs = np.array(devices if devices is not None else jax.devices())
    return Mesh(devs.reshape(-1), (axis,))


def _shard_body(blocks, blens, live, final_idx, phase0, *, level: int,
                ndev: int, axis: str = AXIS):
    """Per-device body: local plan/emit + replicated offset scan + psum."""
    Bl = blocks.shape[0]                       # local blocks per device
    B = Bl * ndev
    me = jax.lax.axis_index(axis)

    plans = jax.vmap(lambda b, l: E.block_plan(b, l, level))(blocks, blens)

    # stage B: gather the tiny per-block size vectors, scan everywhere
    fb = jax.lax.all_gather(plans["fixed_bits"], axis, tiled=True)
    db = jax.lax.all_gather(plans["dyn_bits"], axis, tiled=True)
    bl = jax.lax.all_gather(blens, axis, tiled=True)
    lv = jax.lax.all_gather(live, axis, tiled=True)
    choice, pad, offset, bits = E.choose_blocks(fb, db, bl, lv, level,
                                                phase0)
    offset = offset - phase0                   # segment-relative placement

    lo = me * Bl
    my_choice = jax.lax.dynamic_slice_in_dim(choice, lo, Bl)
    my_pad = jax.lax.dynamic_slice_in_dim(pad, lo, Bl)
    my_offset = jax.lax.dynamic_slice_in_dim(offset, lo, Bl)
    my_bfinal = (lo + jnp.arange(Bl)) == final_idx

    # stage C: emit local blocks
    words = jax.vmap(
        lambda b, n, i, ch, pd, bf: E.emit_block(
            b, n, jax.tree.map(lambda x: x[i], plans), ch, pd, bf)
    )(blocks, blens, jnp.arange(Bl), my_choice, my_pad, my_bfinal)
    words = jnp.where(live[:, None], words, 0)

    # stage D: place at global bit offsets, then combine across devices
    base = (my_offset >> 5).astype(jnp.int32)
    s = (my_offset & 31).astype(jnp.uint32)
    prev = jnp.concatenate([jnp.zeros((Bl, 1), jnp.uint32), words[:, :-1]], 1)
    sh = s[:, None]
    shifted = (words << sh) | jnp.where(sh == 0, jnp.uint32(0),
                                        prev >> (jnp.uint32(32) - sh))
    tail = jnp.where(s == 0, jnp.uint32(0),
                     words[:, -1] >> (jnp.uint32(32) - s))
    tgt = base[:, None] + jnp.arange(E.WB, dtype=jnp.int32)[None, :]
    seg = jnp.zeros((B * E.WB,), jnp.uint32)
    seg = seg.at[tgt.reshape(-1)].add(shifted.reshape(-1), mode="drop")
    seg = seg.at[base + E.WB].add(tail, mode="drop")

    out = jax.lax.psum(seg, axis)
    total = jnp.sum(bits)
    return out, total


@partial(jax.jit, static_argnames=("level", "mesh"))
def encode_mesh(blocks, blens, live, final_idx, level: int, mesh: Mesh,
                phase0=0):
    """Encode B blocks data-parallel over `mesh` into one bitstream.

    blocks: uint8 [B, 32768] with B a multiple of the mesh size; other args
    as in encoder.encode_batch.  Returns (words uint32 [B*WB] — replicated,
    total_bits int32).
    """
    ndev = mesh.devices.size
    axis = mesh.axis_names[0]
    phase0 = jnp.asarray(phase0, jnp.int32)
    body = partial(_shard_body, level=level, ndev=ndev, axis=axis)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(blocks, blens, live, final_idx, phase0)


def compress_mesh(data: bytes, level: int = 2, mesh: Mesh | None = None,
                  config=None) -> bytes:
    """Host front-end: compress one buffer data-parallel over a mesh.

    config: a ``CodecConfig``; supplies level and the mesh axis name
    (config.mesh_axis) when no explicit mesh is given.
    """
    import numpy as np

    from deflate_tpu.ops.bitpack import words_to_bytes
    from deflate_tpu.utils.tables import BLOCK_SIZE

    if config is not None:
        level = config.level
    if mesh is None:
        mesh = make_mesh(axis=config.mesh_axis if config is not None
                         else AXIS)
    ndev = mesh.devices.size
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    nblocks = max(1, -(-len(buf) // BLOCK_SIZE))
    B = -(-nblocks // ndev) * ndev                 # pad to mesh multiple
    blocks = np.zeros((B, BLOCK_SIZE), np.uint8)
    blens = np.zeros((B,), np.int32)
    for i in range(nblocks):
        chunk = buf[i * BLOCK_SIZE:(i + 1) * BLOCK_SIZE]
        blocks[i, :len(chunk)] = chunk
        blens[i] = len(chunk)
    live = np.arange(B) < nblocks
    words, total = encode_mesh(
        jnp.asarray(blocks), jnp.asarray(blens), jnp.asarray(live),
        jnp.int32(nblocks - 1), level, mesh)
    return words_to_bytes(np.asarray(words), int(total))


@partial(jax.jit, static_argnames=("span", "out_cap", "mesh"))
def decode_mesh(words, starts, out_lens, span: int, out_cap: int,
                mesh: Mesh):
    """Data-parallel decode of manifest-indexed blocks over `mesh`.

    Blocks from this framework's encoder are self-contained (quirk Q5), so
    with a manifest (runtime/manifest.py) giving each block's bit offset,
    decode is embarrassingly parallel: every device decodes its shard of
    blocks and the outputs all_gather back in order.

    words:    uint32 [W] compressed stream (replicated)
    starts:   int32 [B] per-block bit offsets (B divisible by mesh size)
    out_lens: int32 [B] expected output bytes per block (0 = padding slot)
    Returns (out uint8 [B, out_cap], produced int32 [B], error bool).
    """
    from deflate_tpu.models import decoder as D

    axis = mesh.axis_names[0]

    def body(starts, out_lens):
        out, produced, err = jax.vmap(
            lambda s: D.decode_block_standalone(words, s, span, out_cap)
        )(starts)
        live = out_lens > 0
        err = err & live
        bad = live & (produced != out_lens)
        out_all = jax.lax.all_gather(out, axis, tiled=True)
        produced_all = jax.lax.all_gather(produced * live, axis, tiled=True)
        err_any = jax.lax.psum(jnp.sum((err | bad).astype(jnp.int32)),
                               axis) > 0
        return out_all, produced_all, err_any

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(starts, out_lens)


def decompress_mesh(stream: bytes, manifest, mesh: Mesh | None = None) -> bytes:
    """Host front-end: decode a manifest-indexed stream over a mesh."""
    import numpy as np

    from deflate_tpu.ops.bitpack import bytes_to_words
    from deflate_tpu.ops.inflate_scan import SPAN
    from deflate_tpu.utils.tables import BLOCK_SIZE

    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.devices.size
    nb = len(manifest.blocks)
    B = -(-nb // ndev) * ndev
    starts = np.zeros((B,), np.int32)
    out_lens = np.zeros((B,), np.int32)
    for i, (off, _, olen) in enumerate(manifest.blocks):
        starts[i] = off
        out_lens[i] = olen
    # span bucketing: the manifest knows every block's compressed size, so
    # the token-scan span shrinks to the largest block (up to 16x less
    # chain-recovery work on compressible data)
    max_bits = max(b[1] for b in manifest.blocks)
    span = SPAN
    for cand in (1 << 14, 1 << 16):
        if max_bits + 64 <= cand:
            span = cand + 64
            break
    words, _ = bytes_to_words(stream)
    out, produced, err = decode_mesh(
        jnp.asarray(words), jnp.asarray(starts), jnp.asarray(out_lens),
        span, BLOCK_SIZE, mesh)
    if bool(err):
        raise ValueError("mesh decode failed (corrupt stream or manifest)")
    out = np.asarray(out)
    produced = np.asarray(produced)
    return b"".join(out[i, :produced[i]].tobytes() for i in range(nb))
