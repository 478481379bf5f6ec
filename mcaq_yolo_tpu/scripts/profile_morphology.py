"""Sub-stage profile of the tiles-in-lanes morphology engine.

The component breakdown (utils/profiling.py component_breakdown) attributes
milliseconds to the morphology stage as a whole; this script splits that
stage into its operator pipeline — pack, blur, Sobel, Canny NMS,
hysteresis, Otsu, binarize, LBP entropy, fractal box-count, Euler/contour —
so the next MFU attack targets the actual top contributor instead of a
guess (VERDICT r2 item 3 protocol).

The reference has no analogue: its metric stage is per-image Python+cv2 on
the host (reference morphology.py:618-713), never on the accelerator.

Run on the real TPU:

    PYTHONPATH=/root/repo:/root/.axon_site \
        python -m mcaq_yolo_tpu.scripts.profile_morphology \
        [--batch 128] [--hw 80] [--tile 8] [--out outputs/r3/morph_profile.json]

(--hw 80 --tile 8 is the P3 scale of yolov8n@640; P4/P5 are 40/4 and
20/2.)
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def run(batch: int = 128, hw: int = 80, tile: int = 8, iters: int = 30,
        dtype: str = "float32"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..core import image_ops as iops
    from ..core import morphology_lanes as ml
    from ..utils.profiling import timed

    rng = np.random.default_rng(0)
    gray = iops.normalize01(
        jnp.asarray(rng.random((batch, hw, hw)), jnp.float32))
    if dtype != "float32":
        gray = gray.astype(dtype)
    packed = jax.device_put(jax.jit(
        lambda g: ml.pack_tiles(g, tile)[0])(gray))

    res = {"config": {"batch": batch, "hw": hw, "tile": tile,
                      "platform": jax.devices()[0].platform,
                      "dtype": dtype}}

    def bench(name, fn, *args):
        ms = timed(jax.jit(fn), *args, iters=iters) * 1e3
        res[name] = round(ms, 3)
        print(f"{name:24s}: {ms:7.3f} ms", flush=True)

    bench("pack_tiles", lambda g: ml.pack_tiles(g, tile)[0], gray)
    bench("gaussian_blur5", lambda p: ml.gaussian_blur5(p, 1.0, "edge"),
          packed)
    bench("sobel", lambda p: ml.sobel(p, "edge"), packed)
    bench("otsu", ml.otsu_threshold, packed)

    gx, gy = jax.jit(lambda p: ml.sobel(p, "edge"))(packed)
    mag = jnp.abs(gx) + jnp.abs(gy)
    bench("canny_nms", ml._canny_nms, mag, gx, gy)

    strong = (mag > 0.5).astype(packed.dtype)
    weak = (mag > 0.25).astype(packed.dtype)

    def hyst(strong, weak):
        edge = strong
        for _ in range(8):
            grown = ml.dilate3(edge)
            edge = jnp.where((weak > 0) & (grown > 0), 1.0, edge)
        return edge

    bench("hysteresis_x8", hyst, strong, weak)
    bench("canny_full", ml.canny_cv2compat, packed)
    bench("adaptive_binarize", ml.adaptive_binarize, packed)
    bench("lbp_entropy", ml.lbp_entropy, packed)

    edge = jax.jit(ml.canny_cv2compat)(packed)
    bench("fractal", lambda e: ml.fractal_dimension(e, tile), edge)
    binm = jax.jit(ml.adaptive_binarize)(packed)
    bench("euler", ml.euler_components, binm)
    bench("contour_incl_euler",
          lambda b: ml.contour_complexity(b, tile, True), binm)
    bench("phi_full",
          lambda g: ml.phi_metrics_tiled(g, tile, "cv2compat", "adaptive",
                                         True), gray)
    return res


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--hw", type=int, default=80)
    p.add_argument("--tile", type=int, default=8)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    res = run(args.batch, args.hw, args.tile, args.iters, args.dtype)
    s = json.dumps(res, indent=1)
    print(s)
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(s + "\n")


if __name__ == "__main__":
    main()
