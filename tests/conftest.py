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

# Long single-process test sessions have segfaulted inside jaxlib's
# persistent-compile-cache serialization (jax/_src/compilation_cache.py
# put_executable_and_time) after many large Pallas compiles — observed
# twice during round-3 judging.  The cache only exists to speed up the
# axon/TPU first-touch path; tests run on CPU, so disable it here before
# deflate_tpu's import-time _enable_compile_cache() can switch it on.
os.environ["DEFLATE_TPU_COMPILE_CACHE"] = ""

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
