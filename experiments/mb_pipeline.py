"""Does per-iteration scalar sync add tunnel RTT to the encode timing?

Compares: (a) sync int(s) every iteration (bench.py's current encode
loop), (b) dispatch all iterations then sync once (the decode loop's
methodology).  The delta is pure tunnel round-trip, not chip compute.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench
from deflate_tpu.models import encoder as E
from deflate_tpu.utils.tables import BLOCK_SIZE

NB = 256
LEVEL = 2

rng = np.random.default_rng(42)
buf = np.frombuffer(bench.make_corpus(rng, NB * BLOCK_SIZE), np.uint8)
blocks = jnp.asarray(buf.reshape(NB, BLOCK_SIZE))
blens = jnp.full((NB,), BLOCK_SIZE, jnp.int32)
live = jnp.ones((NB,), bool)


@jax.jit
def step(blocks):
    w, t, off, bits = E.encode_batch_with_offsets(
        blocks, blens, live, np.int32(NB - 1), LEVEL, 0)
    return t + w[0].astype(jnp.int32)

s = step(blocks)
int(s)

ITERS = 5
t0 = time.perf_counter()
for _ in range(ITERS):
    s = step(blocks)
    int(s)
dt_sync = (time.perf_counter() - t0) / ITERS

t0 = time.perf_counter()
for _ in range(ITERS):
    s = step(blocks)
int(s)
dt_pipe = (time.perf_counter() - t0) / ITERS

mb = NB * BLOCK_SIZE / 1e6
print(f"per-iter sync: {dt_sync*1e3:7.1f} ms  {mb/dt_sync:6.1f} MB/s")
print(f"pipelined:     {dt_pipe*1e3:7.1f} ms  {mb/dt_pipe:6.1f} MB/s")
print(f"delta:         {(dt_sync-dt_pipe)*1e3:7.1f} ms/iter")
