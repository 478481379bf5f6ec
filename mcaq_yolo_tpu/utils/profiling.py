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


def _cost_analysis(jitted, *args) -> Dict[str, float]:
    """XLA's own cost model for a jitted program: total flops and HBM bytes
    accessed (lowered+compiled for the current default device).  Returns
    zeros when the backend doesn't expose cost analysis."""
    try:
        compiled = jitted.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0] if ca else {}
        return {"flops": float(ca.get("flops", 0.0)),
                "bytes": float(ca.get("bytes accessed", 0.0))}
    except Exception:
        return {"flops": 0.0, "bytes": 0.0}


def component_breakdown(model, variables, images, iters: int = 30,
                        cost: bool = False) -> Dict[str, float]:
    """Millisecond attribution of the MCAQ inference forward.

    Times jitted sub-programs: full forward, backbone only,
    backbone+morphology (complexity maps), backbone+MCAQ (quantized feats),
    and derives per-stage deltas.  Sub-program boundaries follow the
    model's own structure (backbone_features / mcaq_transform / neck+head).

    cost=True additionally returns XLA cost-model flops/bytes per
    sub-program (`<stage>_gflops` / `<stage>_gb`), from which callers build
    per-stage rooflines (achieved TFLOP/s and GB/s vs device ceilings).
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

    out = {
        "full_ms": t_full,
        "backbone_ms": t_bb,
        "morphology_ms": t_cplx - t_bb,
        "bitmap_quantize_ms": t_mcaq - t_cplx,
        "neck_head_ms": t_full - t_mcaq,
    }
    if cost:
        progs = {"full": full, "backbone": backbone_only,
                 "cum_complexity": with_complexity, "cum_mcaq": with_mcaq}
        for name, prog in progs.items():
            ca = _cost_analysis(prog, variables, images)
            out[f"{name}_gflops"] = ca["flops"] / 1e9
            out[f"{name}_gb"] = ca["bytes"] / 1e9
        # per-stage deltas mirror the timing deltas
        out["morphology_gflops"] = out["cum_complexity_gflops"] - out["backbone_gflops"]
        out["morphology_gb"] = out["cum_complexity_gb"] - out["backbone_gb"]
        out["bitmap_quantize_gflops"] = out["cum_mcaq_gflops"] - out["cum_complexity_gflops"]
        out["bitmap_quantize_gb"] = out["cum_mcaq_gb"] - out["cum_complexity_gb"]
        out["neck_head_gflops"] = out["full_gflops"] - out["cum_mcaq_gflops"]
        out["neck_head_gb"] = out["full_gb"] - out["cum_mcaq_gb"]
    return out
