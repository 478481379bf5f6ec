"""Microbenchmark: Pallas fused quant kernel vs the XLA 7-plane compose.

Backend-selection evidence for SpatialAdaptiveQuantization.backend — run on
real TPU.  Reports per-scale and total times for the yolov8n/640 and
yolov8m/640 backbone shapes (the shapes the quantizer sees at inference).

Usage: python -m scripts.bench_quant_kernel [--batch 32] [--iters 50]
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mcaq_yolo_tpu.ops.pallas_quant import (
    spatial_quantize_pallas,
    spatial_quantize_reference,
)

# (H, W, C, Ht, Wt) per scale; channels from models/yolo.py width scaling
SHAPES = {
    "yolov8n": [(80, 80, 64, 10, 10), (40, 40, 128, 10, 10), (20, 20, 256, 5, 5)],
    "yolov8m": [(80, 80, 192, 10, 10), (40, 40, 384, 10, 10), (20, 20, 576, 5, 5)],
}


def _sync(y):
    """Force completion via a 1-element device->host fetch.

    jax.block_until_ready is a NO-OP on the tunneled 'axon' platform
    (measured: an 8192^3 matmul 'completed' in 36us = 150x chip peak), and
    per-op host dispatch costs ~0.8ms of hidden round-trip.  A scalar fetch
    is the only reliable barrier; the device stream is in-order, so fetching
    the last output syncs everything before it."""
    np.asarray(y[(0,) * y.ndim])


def _single_pass(x, bit_map, x_min, x_max, mask=None):
    """The production XLA eval path (quantization._compose_integer math)."""
    quant = _sp_module()
    return quant(x, bit_map, x_min, x_max, mask)


def _sp_module():
    from mcaq_yolo_tpu.core.quantization import SpatialAdaptiveQuantization

    q = SpatialAdaptiveQuantization(smooth_transitions=False)

    def fn(x, bit_map, x_min, x_max, mask=None):
        out = q._compose_integer(x.astype(jnp.float32), bit_map, x_min, x_max)
        if mask is not None:
            if mask.ndim == 3:
                mask = mask[..., None]
            out = out * mask
        return out.astype(x.dtype)

    return fn


_ARMS = {
    "xla7": spatial_quantize_reference,   # static 7-plane compose
    "xla_sp": _single_pass,               # single-pass (production 'auto')
    "pallas": spatial_quantize_pallas,    # fused Pallas kernel
}


@partial(jax.jit, static_argnames=("n", "arm"))
def _chain(x, bm, mn, mx, mask, n, arm):
    """n dependent kernel applications inside ONE jit — one dispatch, so the
    ~0.8ms tunnel round-trip amortizes to <2% at n=50."""
    fn = _ARMS[arm]
    return lax.fori_loop(0, n, lambda i, y: fn(y, bm, mn, mx, mask), x)


def _time(arm, args, iters):
    out = _chain(*args, n=iters, arm=arm)
    _sync(out)  # compile + warm
    t0 = time.perf_counter()
    out = _chain(*args, n=iters, arm=arm)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def run(batch=32, iters=50, dtype=jnp.float32, with_mask=True, seed=0):
    rng = np.random.default_rng(seed)
    results = {}
    for variant, shapes in SHAPES.items():
        per_scale = []
        for (H, W, C, Ht, Wt) in shapes:
            x = jnp.asarray(rng.normal(0, 1, (batch, H, W, C)), dtype)
            bit_map = jnp.asarray(rng.integers(2, 9, (batch, Ht, Wt)), jnp.float32)
            x_min = x.min(axis=(0, 1, 2)).astype(jnp.float32)
            x_max = x.max(axis=(0, 1, 2)).astype(jnp.float32)
            mask = (
                jnp.asarray(rng.uniform(0.9, 1.0, (batch, H, W, 1)), jnp.float32)
                if with_mask else None
            )
            args = (x, bit_map, x_min, x_max, mask)
            row = {"shape": [batch, H, W, C]}
            for arm in _ARMS:
                t = _time(arm, args, iters)
                row[f"{arm}_us"] = round(t * 1e6, 1)
            gb = 2 * batch * H * W * C * x.dtype.itemsize / 1e9
            row["sp_gbps"] = round(gb / (row["xla_sp_us"] / 1e6), 1)
            per_scale.append(row)
        totals = {
            f"{arm}_total_us": round(sum(s[f"{arm}_us"] for s in per_scale), 1)
            for arm in _ARMS
        }
        results[variant] = {"scales": per_scale, **totals}
    return results


def main():
    import os

    from mcaq_yolo_tpu.utils.sync import acquire_backend

    acquire_backend()  # bounded: fails fast when the tunnel is down
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--no-mask", action="store_true")
    args = p.parse_args()
    res = run(args.batch, args.iters,
              jnp.bfloat16 if args.bf16 else jnp.float32,
              with_mask=not args.no_mask)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
