"""Reproducibility helpers (reference utils/repro.py:13-41, adapted to JAX).

JAX is deterministic by construction on a fixed platform (explicit PRNG
keys, no hidden global RNG in ops); the host-side stochasticity lives in
Python's `random`, NumPy (data pipeline, augmentation) and the dataloader
shuffle order — those are what seeding controls here.

Known limits (documented, mirroring the reference's notes):
  * XLA may reorder floating-point reductions between platform versions —
    bitwise reproducibility holds per (jaxlib, platform) pair.
  * Multi-host data pipelines must derive per-host seeds from the global one.
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_global_seed(seed: int, deterministic: bool = False) -> None:
    """Seed Python/NumPy RNGs; optionally request deterministic XLA ops.

    Call BEFORE constructing models or dataloaders (the reference seeds
    before any stochastic construction, train.py:54-58)."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    if deterministic:
        # XLA: disable autotuning nondeterminism sources where applicable
        flags = os.environ.get("XLA_FLAGS", "")
        if "--xla_gpu_deterministic_ops" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_gpu_deterministic_ops=true"
            ).strip()


def prng_keys(seed: int, n: int):
    """Convenience: split a fresh PRNG key n ways."""
    import jax

    return jax.random.split(jax.random.PRNGKey(seed), n)
