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


def apply_external_bit_maps(model, variables, images, maps,
                            training: bool = False):
    """Forward the MCAQ model with EXTERNALLY SUPPLIED per-scale bit maps:
    backbone -> quantize(maps) -> neck -> head, with the SAME input
    normalization as MCAQYOLO.__call__ (uint8 batches fed raw into the
    backbone silently zero the detector — the bug class this helper
    exists to centralize).  Returns the raw per-scale prediction maps.
    Shared by the M3 placement and M4 variation-gain ablations; pinned
    against the standard forward by test_scripts.py (identity maps must
    reproduce the normal quantized forward exactly)."""
    from ..models.yolo import normalize_image

    def fwd(mdl):
        feats = mdl.backbone(normalize_image(images), training)
        feats_q = [
            mdl.quantizers[i](f, maps[i], training=training)
            for i, f in enumerate(feats)
        ]
        p3, p4, p5 = mdl.neck(*feats_q, training=training)
        return mdl.head([p3, p4, p5], training)

    return model.apply(variables, method=lambda mdl: fwd(mdl))


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
        compute_map50_95,
        detections_to_numpy,
        extract_targets_per_image,
    )

    pred = Predictor(model_path, num_classes=num_classes, variant=variant,
                     img_size=img_size, warmup=False)
    model, variables = pred.model, pred.variables

    ds_cfg = load_dataset_yaml(data_yaml)
    ds = YOLODataset(ds_cfg["val"], img_size, augment=False)
    loader = DataLoader(ds, batch_size, shuffle=False, drop_last=False)

    # step 1: collect the model's own integer bit maps per image/scale,
    # at the checkpoint's DEPLOYMENT temperature (the budget controller's
    # bit_scale trim rides in the ckpt meta and Predictor honors it —
    # evaluating the placement arms at any other temperature would ablate
    # a bit histogram the deployed model never uses)
    deploy_t = jnp.float32(getattr(pred, "deploy_temperature", 1.0))

    @jax.jit
    def forward_with_maps(variables, images):
        raw, aux = model.apply(variables, images, temperature=deploy_t,
                               quantize=True, training=False)
        return aux["bit_map"]

    # step 2: forward with EXTERNALLY SUPPLIED bit maps (placement arms).
    # The functional design makes this trivial — no hook surgery needed:
    # re-run backbone -> quantize with given maps -> neck -> head.
    @jax.jit
    def forward_given_maps(variables, images, maps):
        raw = apply_external_bit_maps(model, variables, images, maps)
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
        # mAP@50-95 as well: at non-damaging budgets mAP@0.5 saturates and
        # cannot resolve a placement effect (observed on the r5 quality
        # checkpoint: all three arms at 0.9929 mAP@0.5)
        res5095 = compute_map50_95(d["preds"], d["targets"])
        summary[mode] = {"map50": res["map"],
                         "map50_95": res5095["map50_95"],
                         "num_images": res["num_images"]}
    for metric in ("map50", "map50_95"):
        summary[f"placement_gain_vs_permuted_{metric}"] = (
            summary["mcaq"][metric] - summary["permuted"][metric])
        summary[f"placement_gain_vs_inverted_{metric}"] = (
            summary["mcaq"][metric] - summary["inverted"][metric])
    # legacy aliases (r4 evidence schema)
    summary["placement_gain_vs_permuted"] = \
        summary["placement_gain_vs_permuted_map50"]
    summary["placement_gain_vs_inverted"] = \
        summary["placement_gain_vs_inverted_map50"]
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
