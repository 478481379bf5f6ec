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


def probe_devices(timeout_s: float = 120.0):
    """`jax.devices()` with a watchdog.

    When the axon tunnel endpoint is unreachable, backend init does not
    raise — it HANGS indefinitely inside ``make_c_api_client`` (blocking
    connect with no deadline; observed when the tunnel died mid-round).
    Probing from a daemon thread bounds the wait so callers (bench.py,
    require_tpu) can fail fast with a diagnosable error instead of
    freezing the driver."""
    import threading

    import jax

    res = {}

    def _probe():
        try:
            res["devices"] = jax.devices()
        except Exception as e:  # busy tunnel / registration race
            res["error"] = e

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        raise TimeoutError(
            f"jax backend init did not return within {timeout_s}s — "
            "the TPU tunnel endpoint is unreachable (hang, not an error: "
            "make_c_api_client blocks with no deadline)")
    if "error" in res:
        raise res["error"]
    return res["devices"]


def acquire_backend(timeout_s: float = 120.0):
    """Shared bounded backend acquisition for scripts/entry points.

    One place for the three concerns every CLI in this package needs before
    touching jax: (1) respect the package-level import watchdog verdict
    (``mcaq_yolo_tpu.BACKEND_PROBE_TIMED_OUT``) so a hung probe thread that
    still holds jax's global backend lock fails fast instead of deadlocking
    a second ``jax.devices()``; (2) probe with a watchdog (tunnel-down hangs,
    see `probe_devices`); (3) fall back to platform auto-selection when a
    pinned platform name doesn't match the installed plugin's name.
    Returns the device list."""
    import jax

    import mcaq_yolo_tpu

    if getattr(mcaq_yolo_tpu, "BACKEND_PROBE_TIMED_OUT", False):
        raise RuntimeError(
            "TPU tunnel endpoint unreachable (import-time probe timed out; "
            "the hung probe thread holds jax's backend lock — any further "
            "jax.devices() would block forever)")
    try:
        return probe_devices(timeout_s=timeout_s)
    except TimeoutError:
        raise
    except RuntimeError:
        # pinned platform name != installed plugin's name: auto-select
        jax.config.update("jax_platforms", "")
        return probe_devices(timeout_s=timeout_s)


def require_tpu(retries: int = 30, wait_s: float = 10.0):
    """Block until the tunneled TPU is actually acquired; raise otherwise.

    The 'axon' tunnel admits ONE process at a time: while another process
    holds the chip, backend init raises and a bare jax_platforms=''
    fallback would silently land on cpu — poisoning every throughput
    number.  This helper retries the tunnel and asserts the final backend
    is a TPU.  jax CACHES initialized backends, so once a probe has landed
    on cpu the loop must clear backend state before re-probing — otherwise
    every retry just re-reads the cached cpu client."""
    import time

    import jax
    import jax.extend.backend as _jeb

    last = None
    for attempt in range(max(1, retries)):
        try:
            devs = probe_devices(timeout_s=60.0)
            if jax.default_backend() != "cpu":
                return devs
            last = RuntimeError(f"backend is {jax.default_backend()}")
        except TimeoutError as e:  # unreachable endpoint (hang, see probe)
            raise RuntimeError(f"TPU tunnel unreachable: {e}") from e
        except RuntimeError as e:  # busy tunnel / registration race
            last = e
        if attempt + 1 < max(1, retries):
            try:  # drop the cached (cpu or failed) client so the next
                _jeb.clear_backends()  # probe re-attempts the tunnel
            except Exception:
                pass
            time.sleep(wait_s)
    raise RuntimeError(f"TPU not acquired after {retries} tries: {last}")


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
