"""
MCAQ-YOLO-TPU: Morphological Complexity-Aware Quantization for YOLO,
re-designed TPU-first on JAX / Flax / Pallas / pjit.

Capability-parity rebuild of the reference `mcaq_yolo` package
(/root/reference, arXiv:2511.12976).  This is NOT a port: the YOLOv8
detection stack (backbone / FPN neck / Detect head / TAL loss / NMS /
data pipeline) is implemented natively here (the reference imports it
from Ultralytics), MCAQ is inserted as a pure functional transform
between backbone and neck (the reference uses PyTorch forward hooks +
mutable state, see reference models/mcaq_yolo.py:344,402-473), and the
fused spatial-quantization kernel is a Pallas TPU kernel (the reference
ships a CUDA kernel, ops/src/mcaq_kernel.cu).

Layout
------
core/       morphology metrics, bit allocation, quantization, curriculum
models/     YOLOv8 family (n/s/m/l/x), MCAQ assembly, detection loss
ops/        Pallas TPU kernels + pure-XLA references, NMS
data/       YOLO-txt dataset, letterbox, augmentation, fixed-shape batching
parallel/   device mesh, sharding rules, data-parallel train/eval steps
utils/      evaluation (mAP), visualization, repro, model utils
scripts/    backend_agreement, m3_permutation, m4_variation_gain
"""

__version__ = "0.5.0"

# Backend-name guard: some hosts pin JAX_PLATFORMS to a TPU plugin name
# ('axon') that the installed plugin may no longer register under; fall
# back to auto-selection rather than failing every module import.  A
# no-op when the pinned platform (or an explicit cpu override, as in the
# test conftest) initializes fine.
#
# The probe runs under a watchdog thread: a DOWN tunnel endpoint makes
# backend init HANG (blocking connect, no deadline) rather than raise, and
# an import must never hang — on timeout the import proceeds with a
# warning and later device queries surface the problem (bench.py and
# utils.sync.require_tpu() handle it with their own watchdogs).
import os as _os
import threading as _threading
import warnings as _warnings

import jax as _jax

_probe_out = {}


def _probe_backend():  # pragma: no cover - depends on host plugin state
    try:
        _probe_out["devices"] = _jax.devices()
    except Exception as e:
        _probe_out["error"] = e


# True when backend init hung at import: the process is then POISONED —
# the hung thread holds jax's global backend lock, every later device
# query blocks on it, and no in-process recovery exists.  Entry points
# that need a device (bench.py) must check this and exit fast.
BACKEND_PROBE_TIMED_OUT = False

# MCAQ_SKIP_IMPORT_PROBE=1 skips the probe entirely: host-only tools
# (e.g. scripts/quality_assemble.py) must not open the single-admission
# TPU tunnel while a training job holds it.
if _os.environ.get("MCAQ_SKIP_IMPORT_PROBE", "0") != "1":
    _probe_t = _threading.Thread(target=_probe_backend, daemon=True)
    _probe_t.start()
    _probe_t.join(
        float(_os.environ.get("MCAQ_IMPORT_PROBE_TIMEOUT_S", "90")))
else:  # pragma: no cover - env-dependent
    _probe_t = _threading.Thread(target=lambda: None)
if _probe_t.is_alive():  # pragma: no cover - requires a dead tunnel
    BACKEND_PROBE_TIMED_OUT = True
    _warnings.warn(
        "[MCAQ] jax backend init unresponsive (TPU tunnel endpoint down?) "
        "— import continues; device queries may block. Set "
        "MCAQ_IMPORT_PROBE_TIMEOUT_S to tune this probe.")
elif isinstance(_probe_out.get("error"), RuntimeError):
    # auto-select so imports never crash; perf/training entry points that
    # REQUIRE the accelerator should use utils.sync.require_tpu(), which
    # retries the tunnel instead of silently accepting cpu
    _jax.config.update("jax_platforms", "")
del _jax, _os, _threading, _warnings, _probe_t, _probe_backend

# Eager: lightweight pure-math core (mirrors the reference's PEP 562 split,
# reference __init__.py:30-38 — core eager, heavy engine lazy).
from .core.curriculum import CurriculumScheduler  # noqa: F401

_LAZY = {
    "MCAQYOLO": ".models.mcaq_yolo",
    "MCAQYOLOLoss": ".models.losses",
    "Trainer": ".train",
    "Predictor": ".inference",
    "MorphologicalComplexityAnalyzer": ".core.morphology",
    "ComplexityToBitMappingNetwork": ".core.bit_allocation",
    "LinearBitMapper": ".core.bit_allocation",
    "SpatialAdaptiveQuantization": ".core.quantization",
    "LearnedSoftMask": ".core.quantization",
}


def __getattr__(name):  # PEP 562 lazy loading
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name], __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
