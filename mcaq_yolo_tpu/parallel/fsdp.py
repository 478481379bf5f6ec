"""
Fully-sharded data parallelism (FSDP / ZeRO-3 style) over the same 1-D
'data' mesh used for batch sharding.

Why it exists: pure DP replicates parameters, optimizer state (AdamW mu/nu
= 2x params) and — under knowledge distillation — the full FP32 teacher on
EVERY chip.  For yolov8l/x at large batch sizes that replication competes
with activation memory in HBM.  FSDP shards every large parameter /
optimizer / teacher leaf across the 'data' axis instead; XLA's GSPMD
partitioner inserts the per-layer all-gathers (forward/backward) and keeps
the optimizer update fully sharded — the standard JAX FSDP recipe: commit
input shardings with device_put, let the partitioner propagate them
through `jit` (scaling-book recipe; no hand-written collectives).

This is a MEMORY-CAPACITY option, not a speed feature: for a 3-25 M-param
CNN the per-step all-gathers cost more than replication saves, so the
default stays pure DP (`parallel/mesh.py`).  Enable with
`training.parallel: fsdp` in the config.  The reference has no parallelism
at all (SURVEY.md §2.3); this module is TPU-native added capability.

Sharding rule (leaf-wise, shape-only): shard the largest dimension that is
divisible by the mesh axis size; prefer the LAST such dimension on ties
(HWIO conv kernels then shard O, the output-channel dim — the natural
weight-sharded layout for convs).  Leaves smaller than `min_size` elements
(biases, BN scales, EMA quantizer statistics) replicate — sharding them
saves nothing and costs a collective each.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

# Leaves with fewer elements than this replicate.  2048 keeps every conv
# kernel of the smallest variant (yolov8n stem: 3*3*3*16 = 432 < 2048 stays
# replicated; 3*3*16*32 = 4608 shards) while all scalar/1-D state replicates.
MIN_SHARD_SIZE = 2048


def fsdp_spec(shape, axis_size: int, min_size: int = MIN_SHARD_SIZE) -> P:
    """PartitionSpec for one leaf: largest divisible dim sharded on
    'data', last dim wins ties; small or indivisible leaves replicate."""
    if axis_size <= 1 or int(np.prod(shape, dtype=np.int64)) < min_size:
        return P()
    best = -1
    for i, d in enumerate(shape):
        if d % axis_size == 0 and d >= axis_size:
            if best < 0 or d >= shape[best]:
                best = i
    if best < 0:
        return P()
    spec = [None] * len(shape)
    spec[best] = DATA_AXIS
    return P(*spec)


def fsdp_shardings(tree: Any, mesh: Mesh, min_size: int = MIN_SHARD_SIZE):
    """Matching pytree of NamedShardings for `tree` under the FSDP rule."""
    axis_size = mesh.shape[DATA_AXIS]

    def leaf_sharding(x):
        shape = getattr(x, "shape", ())
        return NamedSharding(mesh, fsdp_spec(shape, axis_size, min_size))

    return jax.tree_util.tree_map(leaf_sharding, tree)


def fsdp_shard(tree: Any, mesh: Mesh, min_size: int = MIN_SHARD_SIZE):
    """Place a pytree (TrainState / teacher variables) with every large
    leaf sharded across the 'data' axis and the rest replicated.

    device_put COMMITS the shardings, so a later `jit` (train/eval step)
    sees them as input constraints and GSPMD inserts the all-gathers /
    reduce-scatters; the elementwise AdamW update keeps mu/nu sharded."""
    return jax.device_put(tree, fsdp_shardings(tree, mesh, min_size))


def shard_fraction(tree: Any, mesh: Mesh, min_size: int = MIN_SHARD_SIZE):
    """Diagnostics: fraction of `tree`'s elements that the rule shards
    (vs replicates).  Used by tests and the trainer's startup log."""
    axis_size = mesh.shape[DATA_AXIS]
    total = 0
    sharded = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        n = int(np.prod(getattr(leaf, "shape", ()), dtype=np.int64))
        total += n
        if fsdp_spec(getattr(leaf, "shape", ()), axis_size, min_size) != P():
            sharded += n
    return sharded / max(total, 1)
