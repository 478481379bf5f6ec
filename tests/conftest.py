"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax
initializes, so multi-chip sharding tests run anywhere (the driver separately
dry-runs the multichip path; real-TPU benchmarking happens in bench.py)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (trigger initialization under the env above)
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: this host has a single CPU core, so XLA
# compiles dominate test time — cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
