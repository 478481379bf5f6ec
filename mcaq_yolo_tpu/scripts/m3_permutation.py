"""
M3: bit-PLACEMENT ablation (reference scripts/m3_permutation.py).

Hypothesis: MCAQ's complexity-guided spatial placement matters, not just the
bit histogram.  Three arms at a FIXED per-image bit histogram:
  mcaq     — the model's own complexity->bit placement
  permuted — per-image-seeded random permutation of the same tiles' bits
  inverted — high-complexity tiles get the LOW bits (rank inversion)

Evaluates val mAP@0.5 per arm from a trained checkpoint; JSON summary.

Usage:
    python -m mcaq_yolo_tpu.scripts.m3_permutation --model best.ckpt \
        --data dataset.yaml [--img-size 640] [--num-classes 80] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
from functools import partial
from pathlib import Path

import numpy as np


def permute_bit_map(bit_map: np.ndarray, mode: str, seed: int) -> np.ndarray:
    """Rearrange a (Ht, Wt) integer bit map keeping its histogram fixed."""
    flat = bit_map.reshape(-1)
    if mode == "mcaq":
        return bit_map
    if mode == "permuted":
        rng = np.random.default_rng(seed)
        return rng.permutation(flat).reshape(bit_map.shape)
    if mode == "inverted":
        # rank inversion: the tile with the highest bits gets the lowest
        order = np.argsort(flat)
        out = np.empty_like(flat)
        out[order] = np.sort(flat)[::-1]
        return out.reshape(bit_map.shape)
    raise ValueError(mode)


def run(model_path: str, data_yaml: str, img_size: int = 640,
        num_classes: int = 80, variant: str = "yolov8n",
        batch_size: int = 8, conf: float = 0.001, iou: float = 0.65,
        max_det: int = 300, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from ..data.dataset import DataLoader, YOLODataset, load_dataset_yaml
    from ..inference import Predictor
    from ..models.yolo import decode_predictions
    from ..ops.nms import batched_nms
    from ..utils.evaluation import (
        compute_map,
        detections_to_numpy,
        extract_targets_per_image,
    )

    pred = Predictor(model_path, num_classes=num_classes, variant=variant,
                     img_size=img_size, warmup=False)
    model, variables = pred.model, pred.variables

    ds_cfg = load_dataset_yaml(data_yaml)
    ds = YOLODataset(ds_cfg["val"], img_size, augment=False)
    loader = DataLoader(ds, batch_size, shuffle=False, drop_last=False)

    # step 1: collect the model's own integer bit maps per image/scale
    @jax.jit
    def forward_with_maps(variables, images):
        raw, aux = model.apply(variables, images, temperature=1.0,
                               quantize=True, training=False)
        return aux["bit_map"]

    # step 2: forward with EXTERNALLY SUPPLIED bit maps (placement arms).
    # The functional design makes this trivial — no hook surgery needed:
    # re-run backbone -> quantize with given maps -> neck -> head.
    @jax.jit
    def forward_given_maps(variables, images, maps):
        def fwd(mdl):
            feats = mdl.backbone(images, False)
            feats_q = [
                mdl.quantizers[i](f, maps[i], training=False)
                for i, f in enumerate(feats)
            ]
            p3, p4, p5 = mdl.neck(*feats_q, training=False)
            return mdl.head([p3, p4, p5], False)

        raw = model.apply(variables, method=lambda mdl: fwd(mdl))
        boxes, scores, _, _ = decode_predictions(raw, num_classes)
        return batched_nms(boxes, scores, conf_threshold=conf,
                           iou_threshold=iou, max_det=max_det)

    arms = {m: {"preds": [], "targets": []} for m in ("mcaq", "permuted", "inverted")}
    for bi, batch in enumerate(loader):
        images = jnp.asarray(batch["image"])
        own_maps = jax.device_get(forward_with_maps(variables, images))
        targets = extract_targets_per_image(batch)

        for mode in arms:
            maps = []
            for scale_map in own_maps:
                m = np.asarray(scale_map)
                out = np.stack([
                    permute_bit_map(m[i], mode, seed + bi * 1000 + i)
                    for i in range(m.shape[0])
                ])
                maps.append(jnp.asarray(out))
            det = jax.device_get(forward_given_maps(variables, images, maps))
            arms[mode]["preds"].extend(detections_to_numpy(*det))
            arms[mode]["targets"].extend(targets)

    summary = {}
    for mode, d in arms.items():
        res = compute_map(d["preds"], d["targets"], 0.5)
        summary[mode] = {"map50": res["map"], "num_images": res["num_images"]}
    summary["placement_gain_vs_permuted"] = (
        summary["mcaq"]["map50"] - summary["permuted"]["map50"]
    )
    summary["placement_gain_vs_inverted"] = (
        summary["mcaq"]["map50"] - summary["inverted"]["map50"]
    )
    return summary


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--data", required=True)
    parser.add_argument("--img-size", type=int, default=640)
    parser.add_argument("--num-classes", type=int, default=80)
    parser.add_argument("--variant", default="yolov8n")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--json", default=None)
    args = parser.parse_args(argv)

    summary = run(args.model, args.data, args.img_size, args.num_classes,
                  args.variant, args.batch_size, seed=args.seed)
    out = json.dumps(summary, indent=2)
    print(out)
    if args.json:
        Path(args.json).write_text(out + "\n")


if __name__ == "__main__":
    main()
