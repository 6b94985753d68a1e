"""Minimal repro: jaxlib XLA:CPU aborts/segfaults after many large
compiles in ONE long-lived process (VERDICT r4 #8).

Observed in this repo's test suite (jax 0.9.0, jaxlib CPU backend,
Debian 12, Python 3.12) during rounds 3 and 4: a long single-process
pytest session running many distinct large compiles aborts inside
XLA:CPU compilation — with the persistent compilation cache ENABLED the
crash frame is the cache write (compilation_cache.put_executable_and_
time); with the cache DISABLED it still crashes, in pxla
compile/backend_compile_and_load.  Process-per-file isolation
(pytest-xdist --dist loadfile) is the working guard.

This script distills the trigger: compile a stream of DISTINCT large
programs (shape-perturbed so nothing is cached) until the interpreter
dies.  On the affected machine the abort typically lands within ~60-120
compiles.  Run:

    env JAX_PLATFORMS=cpu python experiments/jaxlib_longsession_repro.py

Exit by crash = repro; clean completion = not reproduced (count/size can
be raised via REPS / BASE).

Upstream filing status: this development environment has no network
egress, so the issue could not be filed from here; the repro is kept
in-tree so it can be attached verbatim once filing is possible.
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("DEFLATE_TPU_COMPILE_CACHE", "")   # cache-less

import jax
import jax.numpy as jnp
import numpy as np

REPS = int(os.environ.get("REPS", "200"))
BASE = int(os.environ.get("BASE", "8192"))


def big_program(n, salt):
    """A compile-heavy program: multi-operand sort + scan + scatter —
    the op mix of this repo's encoder, which triggered the aborts."""

    def f(x):
        keys = (x * 2654435761 + salt).astype(jnp.int32)
        ops = jax.lax.sort([keys] + [x + i for i in range(6)],
                           dimension=-1, num_keys=1)
        s = jnp.cumsum(ops[1], axis=-1)
        idx = jnp.clip(s % n, 0, n - 1)
        out = jnp.zeros_like(x).at[..., idx[0]].add(ops[2][0])
        def step(c, v):
            return c + v, c
        acc, _ = jax.lax.scan(step, jnp.zeros_like(x[:, 0]), x.T)
        return out.sum() + acc.sum() + s[0, -1]

    return jax.jit(f)


def main():
    t0 = time.time()
    for i in range(REPS):
        n = BASE + 64 * (i % 97)            # distinct shapes: no reuse
        x = jnp.asarray(np.arange(4 * n, dtype=np.int32).reshape(4, n))
        fn = big_program(n, i)
        fn(x).block_until_ready()
        if i % 10 == 0:
            print(f"[{time.time()-t0:7.1f}s] compile {i}/{REPS} ok",
                  flush=True)
    print("completed without crash — not reproduced at this size/count")


if __name__ == "__main__":
    sys.exit(main())
