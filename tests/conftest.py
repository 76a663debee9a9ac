"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX fake-backend trick (SURVEY.md §4): pjit/shard_map
logic is validated without a real TPU slice by forcing the host platform
and splitting it into 8 virtual devices. Must run before jax is imported.
"""

import os

# Force CPU: the session environment presets JAX_PLATFORMS to the remote
# TPU platform, which would route every test op through the device tunnel.
# NB: sitecustomize imports jax at interpreter startup, so mutating
# JAX_PLATFORMS here is too late for the env-var path — but backend
# *initialization* is lazy, so jax.config.update still wins as long as it
# runs before the first jax.devices()/op.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
