"""
Data-parallel execution over a jax.sharding.Mesh.

The model (3-25 M-param CNN detector) is small relative to per-chip HBM, so
the right parallelism is pure batch-sharded data parallelism: parameters and
quantizer statistics replicated, the batch split along the 'data' mesh axis.
Gradients are reduced by XLA-inserted all-reduces that ride the ICI — we
only annotate shardings (in_shardings/out_shardings on jit) and let the
partitioner place the collectives (the 'How to Scale Your Model' recipe).

No TP/PP/SP/EP: the reference has no parallelism at all (SURVEY.md §2.3) and
a CNN this size cannot use tensor or pipeline sharding productively; scaling
is images/sec via DP.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Place every array in the batch dict with its leading (batch) axis
    split across the data mesh axis."""
    sh = batch_sharding(mesh)
    return {
        k: jax.device_put(v, sh) if hasattr(v, "shape") else v
        for k, v in batch.items()
    }


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sh = replicate_sharding(mesh)
    return jax.device_put(tree, sh)
