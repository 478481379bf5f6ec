"""
Device synchronization barrier that works on every JAX platform this
framework targets, including the tunneled 'axon' TPU where
``jax.block_until_ready`` is a NO-OP (measured: an 8192^3 matmul "completed"
in 36us = 150x chip peak — see PARITY.md).

A 1-element device->host fetch is a reliable barrier: the device stream is
in-order, so fetching one scalar from the last output syncs every queued
execution.  All timing paths in this package (bench.py, utils.profiling,
utils.evaluation) go through `sync` so latency numbers are real on the
bench host (VERDICT r2 weak-5).
"""

from __future__ import annotations

import numpy as np


def sync(out) -> None:
    """Block until every computation producing `out` has finished on device.

    Accepts any pytree; fetches one element of the first array leaf.  The
    TPU executes streams in-order, so this is a full barrier for all work
    queued before `out` was produced.
    """
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    arr = np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])
    del arr
