"""
MCAQ-YOLO-TPU benchmark — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json north star): 640px images/sec/chip for
batched yolov8n MCAQ inference (quantized forward through the fused
quantization path) on the real TPU.

vs_baseline: the reference repo publishes no measured numbers
(BASELINE.md — "no trained weights, no paper-table configs/results");
its only latency anchor is the paper's 151 FPS claim
(reference README.md:375-379), so vs_baseline = images_per_sec / 151.0.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PAPER_FPS_BASELINE = 151.0  # arXiv:2511.12976 latency claim (reference README)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mcaq_yolo_tpu.models import MCAQYOLO

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    img = int(os.environ.get("BENCH_IMG", "640"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    # bf16 network compute by default on TPU (fp32 metric pipeline either way)
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    variant = os.environ.get("BENCH_VARIANT", "yolov8n")
    model = MCAQYOLO(variant=variant, num_classes=80, bit_mapping="mlp",
                     dtype=dtype)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((batch, img, img, 3), np.float32))
    variables = model.init(jax.random.PRNGKey(0), images[:1], training=False)

    @jax.jit
    def forward(variables, images):
        raw_maps, aux = model.apply(
            variables, images, temperature=1.0, quantize=True, training=False
        )
        return raw_maps, aux["avg_bits"]

    def sync(out):
        """jax.block_until_ready is a NO-OP on the tunneled 'axon' TPU
        platform (measured: an 8192^3 matmul "completed" in 36us = 150x
        chip peak).  A 1-element device->host fetch is a reliable barrier:
        the device stream is in-order, so fetching from the last output
        syncs every queued execution."""
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    # compile + warmup
    for _ in range(warmup):
        sync(forward(variables, images))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(variables, images)
    sync(out)
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * iters / dt
    result = {
        "metric": f"{variant}_mcaq_infer_640_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / PAPER_FPS_BASELINE, 3),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
