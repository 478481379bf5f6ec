"""Test configuration: force an 8-virtual-device CPU platform, so multi-chip
sharding tests run anywhere (the driver separately dry-runs the multichip
path; real-TPU benchmarking happens in bench.py).

This host's sitecustomize (/root/.axon_site) imports jax and registers the
TPU plugin at INTERPRETER START with JAX_PLATFORMS=axon baked into
jax.config — so the platform must be overridden via jax.config.update (env
edits are too late for JAX_PLATFORMS, but XLA_FLAGS is still read lazily at
first backend init, which hasn't happened yet)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: this host has a single CPU core, so XLA
# compiles dominate test time — cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.default_backend() == "cpu", "tests must run on the CPU platform"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
