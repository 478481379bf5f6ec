"""Batch-sweep non-monotonicity diagnosis (VERDICT r2 item 2: "no
unexplained non-monotonicity" in the throughput sweep).

Round-2/3 sweeps showed yolov8n 640px forward img/s NON-monotone in batch:
bs=128 ~3,950 but bs=160 ~2,650 and bs=192 ~3,060, recovering by bs=256.
This script attributes the dip: for each batch size it measures the full
forward plus the component breakdown (backbone / morphology / bit-map +
quantize / neck+head), normalizes to per-image ms, and reports which stage
degrades.  Run on the real TPU:

    PYTHONPATH=/root/repo:/root/.axon_site \
        python -m mcaq_yolo_tpu.scripts.perf_sweep_diag \
        [--batches 96,128,160,192,224,256] [--out outputs/r3/sweep_diag.json]

Reference context: the reference benches CUDA fps at fixed batch
(reference inference.py:293-321); a TPU sweep is the roofline-correct
protocol, so the sweep itself must be explainable.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def run(batches, variant="yolov8n", img=640, iters=20, dtype="bfloat16",
        downsample=1):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models import MCAQYOLO
    from ..utils.profiling import component_breakdown
    from ..utils.sync import require_tpu

    require_tpu()
    # measured device ceilings (PARITY.md round-2: bf16 matmul 125 TFLOP/s,
    # flat f32 HBM stream ~411 GB/s on this chip via the tunnel)
    MATMUL_TFLOPS, STREAM_GBPS = 125.0, 411.0
    STAGES = ("backbone", "morphology", "bitmap_quantize", "neck_head")
    results = {}
    for i, bs in enumerate(batches):
        model = MCAQYOLO(variant=variant, num_classes=80, bit_mapping="mlp",
                         dtype=dtype, morph_downsample=downsample)
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.random((bs, img, img, 3), np.float32))
        variables = jax.device_put(
            model.init(jax.random.PRNGKey(0), images[:1], training=False))
        bd = component_breakdown(model, variables, images, iters=iters,
                                 cost=(i == 0 or bs == 128))
        per_img = {k: round(v / bs * 1000, 1) for k, v in bd.items()
                   if k.endswith("_ms")}
        entry = {
            "ms": {k: round(v, 2) for k, v in bd.items() if k.endswith("_ms")},
            "us_per_image": per_img,
            "imgs_per_sec": round(bs / bd["full_ms"] * 1000, 1),
        }
        if "full_gflops" in bd:
            # per-stage roofline: achieved TFLOP/s and GB/s vs ceilings —
            # each stage is at ITS OWN bound (VERDICT r2 item 3's
            # documented-proof branch)
            roof = {}
            for s in STAGES + ("full",):
                ms = bd[f"{s}_ms"]
                if ms <= 0:
                    continue
                tf = bd.get(f"{s}_gflops", 0.0) / ms  # GFLOP / ms = TFLOP/s
                gbps = bd.get(f"{s}_gb", 0.0) / (ms / 1000.0)
                roof[s] = {
                    "gflops": round(bd.get(f"{s}_gflops", 0.0), 1),
                    "gb": round(bd.get(f"{s}_gb", 0.0), 2),
                    "achieved_tflops": round(tf, 1),
                    "achieved_gbps": round(gbps, 1),
                    "pct_matmul_ceiling": round(tf / MATMUL_TFLOPS * 100, 1),
                    "pct_stream_ceiling": round(gbps / STREAM_GBPS * 100, 1),
                    "bound": ("compute" if tf / MATMUL_TFLOPS
                              > gbps / STREAM_GBPS else "bandwidth"),
                }
            entry["roofline"] = roof
        results[f"bs{bs}"] = entry
        print(f"bs={bs}: {entry}", flush=True)

    # attribution: which stage's per-image cost moves the most across sizes
    stages = [k for k in next(iter(results.values()))["us_per_image"]]
    attribution = {}
    for s in stages:
        vals = {b: r["us_per_image"][s] for b, r in results.items()}
        lo, hi = min(vals.values()), max(vals.values())
        attribution[s] = {"us_per_image": vals,
                          "spread_pct": round((hi - lo) / max(lo, 1e-9) * 100, 1)}
    return {"config": {"variant": variant, "img": img, "dtype": dtype,
                       "iters": iters, "downsample": downsample},
            "sweep": results, "attribution": attribution}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="96,128,160,192,224,256")
    p.add_argument("--variant", default="yolov8n")
    p.add_argument("--img", type=int, default=640)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--downsample", type=int, default=1)
    p.add_argument("--out", default="outputs/r3/sweep_diag.json")
    a = p.parse_args(argv)
    table = run([int(b) for b in a.batches.split(",")], a.variant, a.img,
                a.iters, a.dtype, a.downsample)
    Path(a.out).parent.mkdir(parents=True, exist_ok=True)
    Path(a.out).write_text(json.dumps(table, indent=2) + "\n")
    print(json.dumps(table["attribution"], indent=2))


if __name__ == "__main__":
    main()
