"""
Backend agreement: JAX tile-metric surrogates vs the exact OpenCV backend
(reference scripts/backend_agreement.py) — the numerical-fidelity regression
harness for the metric pipeline.  The reference measured fused-map r~0.88
for its cv2compat surrogates vs r~0.45 legacy (reference README).

Per-metric and fused-map Pearson/Spearman over N images from a directory
(or a synthetic set when none is given).  `--legacy` switches the surrogate
to the pre-fix Canny/binarize variants for the comparison arm.

Usage:
    python -m mcaq_yolo_tpu.scripts.backend_agreement \
        [--images DIR] [--num 16] [--img-size 256] [--legacy] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def run(images_dir=None, num_images: int = 16, img_size: int = 256,
        legacy: bool = False, grid_size: int = 8, metric_mode: str = "tiled",
        corpus: str = "synthetic"):
    import jax
    import jax.numpy as jnp
    from scipy import stats

    from ..core import morphology_cv2
    from ..core.morphology import compute_phi_tiles
    from ..data.dataset import (
        IMG_EXTS,
        letterbox,
        make_natural_statistics_images,
        make_synthetic_dataset,
    )

    corpus_src = "dir"
    if images_dir is None:
        import tempfile

        corpus_src = corpus
        tmp = tempfile.mkdtemp(prefix="backend_agreement_")
        if corpus == "natural":
            # 1/f-spectrum / fractal-texture / mixed-scene procedural set —
            # natural-image statistics, the harder corpus (VERDICT r3
            # item 6; the reference measured r~0.88 on natural photos)
            images_dir = make_natural_statistics_images(
                tmp, n_images=num_images, img_size=img_size)
        else:
            make_synthetic_dataset(tmp, n_images=num_images,
                                   img_size=img_size)
            images_dir = str(Path(tmp) / "images" / "train")
        print(f"[backend_agreement] no --images given; {corpus} set at "
              f"{images_dir}")

    files = sorted(
        str(p) for p in Path(images_dir).rglob("*") if p.suffix.lower() in IMG_EXTS
    )[:num_images]
    if not files:
        raise FileNotFoundError(f"no images in {images_dir}")

    canny_impl = "legacy" if legacy else "cv2compat"
    binarize_impl = "otsu" if legacy else "adaptive"

    phi_fn = jax.jit(
        lambda x: compute_phi_tiles(
            x, grid_size=grid_size, canny_impl=canny_impl,
            binarize_impl=binarize_impl,
            contour_components=not legacy,
            metric_mode=metric_mode,
        )[1]
    )

    from PIL import Image

    gpu_vals = {k: [] for k in ("fractal", "texture", "gradient", "edge", "contour")}
    cv2_vals = {k: [] for k in gpu_vals}

    for f in files:
        img = np.asarray(Image.open(f).convert("RGB"))
        lb, _, _ = letterbox(img, img_size)
        x = (lb.astype(np.float32) / 255.0)[None]

        detailed_jax = jax.device_get(phi_fn(jnp.asarray(x)))
        _, detailed_cv2 = morphology_cv2.phi_tiles_cv2(x, grid_size)

        for k in gpu_vals:
            gpu_vals[k].append(np.asarray(detailed_jax[k]).reshape(-1))
            cv2_vals[k].append(detailed_cv2[k].reshape(-1))

    results = {"backend": canny_impl, "metric_mode": metric_mode,
               "corpus": corpus_src, "num_images": len(files)}
    fused_gpu, fused_cv2 = [], []
    alpha = np.ones(5) / 5.0
    for i, k in enumerate(gpu_vals):
        g = np.concatenate(gpu_vals[k])
        c = np.concatenate(cv2_vals[k])
        pear = stats.pearsonr(g, c)[0] if g.std() > 0 and c.std() > 0 else float("nan")
        spear = stats.spearmanr(g, c)[0] if g.std() > 0 and c.std() > 0 else float("nan")
        results[k] = {
            "pearson": float(pear), "spearman": float(spear),
            "mean_jax": float(g.mean()), "mean_cv2": float(c.mean()),
        }
        fused_gpu.append(alpha[i] * g)
        fused_cv2.append(alpha[i] * c)

    fg = np.sum(fused_gpu, axis=0)
    fc = np.sum(fused_cv2, axis=0)
    results["fused"] = {
        "pearson": float(stats.pearsonr(fg, fc)[0]),
        "spearman": float(stats.spearmanr(fg, fc)[0]),
    }
    return results


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", default=None)
    parser.add_argument("--num", type=int, default=16)
    parser.add_argument("--img-size", type=int, default=256)
    parser.add_argument("--grid-size", type=int, default=8)
    parser.add_argument("--legacy", action="store_true")
    parser.add_argument("--mode", default="tiled", choices=["tiled", "global"])
    parser.add_argument("--corpus", default="synthetic",
                        choices=["synthetic", "natural"],
                        help="procedural corpus when --images is absent: "
                             "'natural' = 1/f-spectrum / fractal-texture / "
                             "mixed scenes (natural-image statistics)")
    parser.add_argument("--json", default=None)
    args = parser.parse_args(argv)

    results = run(args.images, args.num, args.img_size, args.legacy,
                  args.grid_size, args.mode, corpus=args.corpus)
    out = json.dumps(results, indent=2)
    print(out)
    if args.json:
        Path(args.json).write_text(out + "\n")


if __name__ == "__main__":
    main()
