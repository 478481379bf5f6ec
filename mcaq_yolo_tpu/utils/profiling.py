"""
Tracing / profiling (SURVEY §5 aux subsystems).

The reference's profiling is ad-hoc wall-clock + cuda events
(reference inference.py:266-271, evaluation.py:227-250, model_utils.py:39-78);
the TPU-native equivalents here:

  * `trace(...)`: jax.profiler trace context writing a TensorBoard-viewable
    xplane capture of device + host activity.
  * `timed(...)`: steady-state timing bracketed by a 1-element host-fetch
    barrier (utils.sync) — jax.block_until_ready is a no-op on the
    tunneled TPU platform, so it must never be used for timing here.
  * `component_breakdown(...)`: per-component latency attribution for the
    MCAQ forward (backbone / morphology / bit-map / quantize / neck+head) by
    timing jitted sub-programs — the question 'where do the milliseconds
    go?' the reference can't answer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from .sync import sync


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mcaq_trace"):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, iters: int = 50, warmup: int = 3) -> float:
    """Steady-state seconds/call bracketed by the host-fetch barrier."""
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def component_breakdown(model, variables, images, iters: int = 30) -> Dict[str, float]:
    """Millisecond attribution of the MCAQ inference forward.

    Times jitted sub-programs: full forward, backbone only,
    backbone+morphology (complexity maps), backbone+MCAQ (quantized feats),
    and derives per-stage deltas.  Sub-program boundaries follow the
    model's own structure (backbone_features / mcaq_transform / neck+head).
    """
    model_apply = model.apply

    @jax.jit
    def full(v, x):
        return model_apply(v, x, temperature=1.0, training=False)

    @jax.jit
    def backbone_only(v, x):
        return model_apply(v, x, method="backbone_features")

    @jax.jit
    def with_complexity(v, x):
        def fn(mdl, x):
            feats = mdl.backbone(x, False)
            return [mdl.complexity_analyzer(f) for f in feats]

        return model_apply(v, x, method=fn)

    @jax.jit
    def with_mcaq(v, x):
        def fn(mdl, x):
            feats = mdl.backbone(x, False)
            return [
                mdl.mcaq_transform(f, i, 1.0, True, False)[0]
                for i, f in enumerate(feats)
            ]

        return model_apply(v, x, method=fn)

    t_full = timed(full, variables, images, iters=iters) * 1e3
    t_bb = timed(backbone_only, variables, images, iters=iters) * 1e3
    t_cplx = timed(with_complexity, variables, images, iters=iters) * 1e3
    t_mcaq = timed(with_mcaq, variables, images, iters=iters) * 1e3

    return {
        "full_ms": t_full,
        "backbone_ms": t_bb,
        "morphology_ms": t_cplx - t_bb,
        "bitmap_quantize_ms": t_mcaq - t_cplx,
        "neck_head_ms": t_full - t_mcaq,
    }
