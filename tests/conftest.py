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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
