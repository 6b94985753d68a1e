"""Test configuration: force the CPU backend with 8 virtual devices.

Tests must run without TPU hardware; sharding tests use an 8-device CPU mesh.
The container's sitecustomize registers the TPU backend eagerly, so the env
var alone is not enough — we override via jax.config before any test imports
jax functionality.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

# Long single-process test sessions have segfaulted/aborted inside
# jaxlib — in the persistent-compile-cache write during round-3 judging
# AND in plain XLA:CPU compiles (round 4, cache disabled) — so the real
# guard is pytest.ini's per-file xdist workers, not the cache toggle.
# Tests default to a repo-local cache dir: the suite is compile-bound on
# this 4-core box (every worker recompiling every program is the wall
# time), and warm replays cut the quick tier severalfold.  Set
# DEFLATE_TPU_COMPILE_CACHE= (empty) to run cache-less.
os.environ.setdefault(
    "DEFLATE_TPU_COMPILE_CACHE",
    os.path.join(os.path.dirname(__file__), os.pardir, ".cache",
                 "jax_test"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
