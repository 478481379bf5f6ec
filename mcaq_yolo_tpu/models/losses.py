"""
Detection loss (YOLOv8 semantics: TAL assignment + CIoU + BCE cls + DFL)
and the combined MCAQ loss (paper Eq.20).

The reference delegates detection loss to Ultralytics' v8DetectionLoss
(reference models/mcaq_yolo.py:84,143-155); this is a native fixed-shape JAX
implementation: the Task-Aligned Assigner's dynamic top-k / argmax selection
is formulated entirely with masks over a static (B, M, A) tensor — no
data-dependent shapes, fully jit/pjit compatible (SURVEY.md §7 'hard parts').

Targets are fixed-shape padded per batch:
    gt_boxes   (B, M, 4) xyxy, input pixels
    gt_classes (B, M)    int32
    gt_mask    (B, M)    validity (False rows are padding)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .yolo import REG_MAX, decode_predictions, dfl_decode, make_anchors

# ---------------------------------------------------------------------------
# IoU family
# ---------------------------------------------------------------------------


def box_iou_pairwise(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7):
    """Plain IoU between (..., 4) xyxy boxes (broadcasting)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0, None) * jnp.clip(a[..., 3] - a[..., 1], 0, None)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0, None) * jnp.clip(b[..., 3] - b[..., 1], 0, None)
    return inter / (area_a + area_b - inter + eps)


def ciou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Complete IoU between broadcastable (..., 4) xyxy boxes."""
    iou = box_iou_pairwise(a, b, eps)

    # enclosing box diagonal
    cw = jnp.maximum(a[..., 2], b[..., 2]) - jnp.minimum(a[..., 0], b[..., 0])
    ch = jnp.maximum(a[..., 3], b[..., 3]) - jnp.minimum(a[..., 1], b[..., 1])
    c2 = cw**2 + ch**2 + eps

    # center distance
    ax = (a[..., 0] + a[..., 2]) * 0.5
    ay = (a[..., 1] + a[..., 3]) * 0.5
    bx = (b[..., 0] + b[..., 2]) * 0.5
    by = (b[..., 1] + b[..., 3]) * 0.5
    rho2 = (ax - bx) ** 2 + (ay - by) ** 2

    # aspect-ratio term
    aw = jnp.clip(a[..., 2] - a[..., 0], eps, None)
    ah = jnp.clip(a[..., 3] - a[..., 1], eps, None)
    bw = jnp.clip(b[..., 2] - b[..., 0], eps, None)
    bh = jnp.clip(b[..., 3] - b[..., 1], eps, None)
    v = (4.0 / (jnp.pi**2)) * (jnp.arctan(bw / bh) - jnp.arctan(aw / ah)) ** 2
    alpha = v / jnp.clip(1.0 - iou + v, eps, None)
    alpha = jax.lax.stop_gradient(alpha)

    return iou - rho2 / c2 - alpha * v


# ---------------------------------------------------------------------------
# Task-Aligned Assigner (fixed-shape, mask-based)
# ---------------------------------------------------------------------------


def task_aligned_assign(
    pred_scores: jnp.ndarray,   # (B, A, nc) sigmoid probabilities
    pred_boxes: jnp.ndarray,    # (B, A, 4) xyxy (consistent units w/ gt)
    anchor_points: jnp.ndarray,  # (A, 2) in the SAME units as boxes
    gt_boxes: jnp.ndarray,      # (B, M, 4)
    gt_classes: jnp.ndarray,    # (B, M)
    gt_mask: jnp.ndarray,       # (B, M)
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
):
    """Returns (target_boxes (B,A,4), target_scores (B,A,nc), fg_mask (B,A)).

    All selection steps (candidate gating, per-GT top-k, multi-GT conflict
    resolution by max overlap) are masked tensor ops on a static (B, M, A)
    grid — the jit-safe reformulation of the dynamic-shape assigner."""
    B, A, nc = pred_scores.shape
    M = gt_boxes.shape[1]

    gt_valid = gt_mask.astype(jnp.bool_)  # (B, M)

    # anchor centers inside gt boxes: (B, M, A)
    px = anchor_points[None, None, :, 0]
    py = anchor_points[None, None, :, 1]
    in_gts = (
        (px > gt_boxes[..., 0:1])
        & (py > gt_boxes[..., 1:2])
        & (px < gt_boxes[..., 2:3])
        & (py < gt_boxes[..., 3:4])
    )  # (B, M, A)

    # CIoU overlaps (B, M, A)
    overlaps = jnp.clip(
        ciou(gt_boxes[:, :, None, :], pred_boxes[:, None, :, :]), 0.0, None
    )

    # class score of each gt's class at each anchor: (B, M, A)
    cls_idx = jnp.clip(gt_classes, 0, nc - 1)  # (B, M)
    scores_t = jnp.transpose(pred_scores, (0, 2, 1))  # (B, nc, A)
    s = jnp.take_along_axis(scores_t, cls_idx[:, :, None], axis=1)  # (B, M, A)

    align = (s**alpha) * (overlaps**beta)
    candidate = in_gts & gt_valid[:, :, None]
    align = jnp.where(candidate, align, 0.0)

    # strict top-k per gt over anchors (static k) by iterative masked argmax:
    # k rounds of (argmax, knock out) — identical selection to lax.top_k with
    # an exact-ties-to-lowest-index rule (argmax returns the first maximum,
    # exactly top_k's stable order), but compiled as k cheap VPU
    # reduce+compare passes instead of a per-row sort plus a scatter-add
    # (XLA:TPU lowers variadic sort and scatter far off the vector unit's
    # speed of light; measured in evidence/r5/train_breakdown.json where
    # TAL+loss cost as much as the whole model forward).
    anchor_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, A), 2)
    mask_topk = jnp.zeros(align.shape, jnp.bool_)
    work = align
    for _ in range(topk):
        idx = jnp.argmax(work, axis=-1)  # (B, M), first max on ties
        val = jnp.max(work, axis=-1)  # (B, M)
        pick = (anchor_iota == idx[..., None]) & (val > eps)[..., None]
        mask_topk = mask_topk | pick
        work = jnp.where(pick, -1.0, work)
    mask_pos = mask_topk & candidate  # (B, M, A)

    # conflict resolution: anchor claimed by multiple gts -> max overlap wins
    n_claims = mask_pos.sum(axis=1, keepdims=True)  # (B, 1, A)
    ov_masked = jnp.where(mask_pos, overlaps, -1.0)
    best_gt = jnp.argmax(ov_masked, axis=1)  # (B, A)
    is_best = jax.nn.one_hot(best_gt, M, dtype=jnp.bool_, axis=1)  # (B, M, A)
    mask_pos = jnp.where(n_claims > 1, mask_pos & is_best, mask_pos)

    fg_mask = mask_pos.any(axis=1)  # (B, A)
    assigned_gt = jnp.argmax(mask_pos, axis=1)  # (B, A); 0 where fg_mask False

    # gather per-anchor targets
    tb = jnp.take_along_axis(gt_boxes, assigned_gt[..., None], axis=1)  # (B, A, 4)
    tc = jnp.take_along_axis(gt_classes, assigned_gt, axis=1)  # (B, A)

    # normalized target scores (align metric rescaled per gt by its max CIoU)
    align_pos = jnp.where(mask_pos, align, 0.0)
    pos_align_max = align_pos.max(axis=2, keepdims=True)  # (B, M, 1)
    pos_overlap_max = jnp.where(mask_pos, overlaps, 0.0).max(axis=2, keepdims=True)
    norm_align = align_pos * pos_overlap_max / (pos_align_max + eps)  # (B, M, A)
    anchor_score = norm_align.max(axis=1)  # (B, A)

    target_scores = (
        jax.nn.one_hot(tc, nc, dtype=jnp.float32)
        * anchor_score[..., None]
        * fg_mask[..., None].astype(jnp.float32)
    )
    return tb, target_scores, fg_mask


# ---------------------------------------------------------------------------
# v8 detection loss
# ---------------------------------------------------------------------------


def _bce_with_logits(logits, targets):
    """Elementwise binary cross-entropy with logits (stable)."""
    return jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def _dfl_loss(pred_dist: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Distribution focal loss: CE against the two integer bins adjacent to
    the continuous target distance.  pred_dist (..., REG_MAX) logits,
    target (...,) in [0, REG_MAX - 1]."""
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    ll = jnp.take_along_axis(logp, jnp.clip(tl, 0, REG_MAX - 1)[..., None], axis=-1)[..., 0]
    lr = jnp.take_along_axis(logp, jnp.clip(tr, 0, REG_MAX - 1)[..., None], axis=-1)[..., 0]
    return -(ll * wl + lr * wr)


class DetectionLoss:
    """YOLOv8 detection loss: TAL-assigned CIoU + BCE + DFL with the standard
    gains (box 7.5, cls 0.5, dfl 1.5).  Pure callable — construct once, use
    inside jit."""

    def __init__(self, num_classes: int = 80, box_gain: float = 7.5,
                 cls_gain: float = 0.5, dfl_gain: float = 1.5):
        self.nc = num_classes
        self.box_gain = box_gain
        self.cls_gain = cls_gain
        self.dfl_gain = dfl_gain

    def __call__(
        self,
        raw_maps: Sequence[jnp.ndarray],
        gt_boxes: jnp.ndarray,
        gt_classes: jnp.ndarray,
        gt_mask: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        B = raw_maps[0].shape[0]
        feat_shapes = [m.shape[1:3] for m in raw_maps]
        points, strides = make_anchors(feat_shapes)  # feature units

        flat = jnp.concatenate(
            [m.reshape(B, -1, m.shape[-1]) for m in raw_maps], axis=1
        ).astype(jnp.float32)
        pred_dist = flat[..., : 4 * REG_MAX].reshape(B, -1, 4, REG_MAX)
        cls_logits = flat[..., 4 * REG_MAX:]
        pred_scores = jax.nn.sigmoid(cls_logits)

        # decode boxes in STRIDE-NORMALIZED units (TAL + CIoU operate there)
        dist = dfl_decode(pred_dist)  # (B, A, 4) ltrb feature units
        pb = jnp.concatenate(
            [points[None] - dist[..., :2], points[None] + dist[..., 2:]], axis=-1
        )  # (B, A, 4) in per-anchor feature units

        # per-anchor strides differ across scales, so the assigner compares
        # in PIXEL units (scale pred boxes up) and the box/dfl losses in
        # stride-normalized units (scale targets down per anchor).
        pb_pix = pb * strides[None]  # (B, A, 4) pixels
        points_pix = points * strides  # (A, 2) pixels

        # the assigner is a TARGET BUILDER, not part of the differentiable
        # graph: the reference's v8DetectionLoss calls it on detached
        # scores/boxes (pred_scores.detach(), pred_bboxes.detach()), so the
        # BCE/box/dfl targets and their weights carry no gradient.  Detaching
        # here matches that semantics and removes the entire (B, M, A)
        # assignment graph from the backward pass (measured at ~49% of the
        # train step, evidence/r5/train_breakdown.json).
        tb, target_scores, fg_mask = task_aligned_assign(
            jax.lax.stop_gradient(pred_scores),
            jax.lax.stop_gradient(pb_pix),
            points_pix, gt_boxes, gt_classes, gt_mask
        )

        tss = jnp.clip(target_scores.sum(), 1.0, None)

        # cls
        loss_cls = _bce_with_logits(cls_logits, target_scores).sum() / tss

        # box (CIoU weighted by assigned score), stride-normalized units
        tb_s = tb / strides[None]
        weight = target_scores.sum(-1) * fg_mask  # (B, A)
        iou_term = ciou(pb, tb_s)
        loss_box = ((1.0 - iou_term) * weight).sum() / tss

        # dfl: target ltrb distances in feature units, clipped to bin range
        t_lt = points[None] - tb_s[..., :2]
        t_rb = tb_s[..., 2:] - points[None]
        t_dist = jnp.clip(
            jnp.concatenate([t_lt, t_rb], axis=-1), 0.0, REG_MAX - 1 - 0.01
        )  # (B, A, 4)
        dfl = _dfl_loss(pred_dist, t_dist).mean(-1)  # (B, A)
        loss_dfl = (dfl * weight).sum() / tss

        loss_vec = jnp.stack(
            [self.box_gain * loss_box, self.cls_gain * loss_cls, self.dfl_gain * loss_dfl]
        )
        items = {
            "box_loss": loss_vec[0],
            "cls_loss": loss_vec[1],
            "dfl_loss": loss_vec[2],
            "num_fg": fg_mask.sum(),
        }
        return loss_vec, items


# ---------------------------------------------------------------------------
# Knowledge distillation (paper Sec IV-E)
# ---------------------------------------------------------------------------


def kd_logit_loss(
    student_maps: Sequence[jnp.ndarray], teacher_maps: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """Logit-level KD: MSE over matched raw Detect maps; mismatched shapes
    skipped defensively (reference models/mcaq_yolo.py:39-56)."""
    losses = []
    for s, t in zip(student_maps, teacher_maps):
        if s.shape == t.shape:
            losses.append(
                jnp.mean(
                    (s.astype(jnp.float32) - jax.lax.stop_gradient(t).astype(jnp.float32)) ** 2
                )
            )
    if not losses:
        return jnp.zeros(())
    return sum(losses) / len(losses)


def kd_feature_loss(
    student_feats: Sequence[jnp.ndarray], teacher_feats: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """Feature-level KD: MSE between matched backbone feature maps."""
    losses = []
    for s, t in zip(student_feats, teacher_feats):
        if s.shape == t.shape:
            losses.append(
                jnp.mean(
                    (s.astype(jnp.float32) - jax.lax.stop_gradient(t).astype(jnp.float32)) ** 2
                )
            )
    if not losses:
        return jnp.zeros(())
    return sum(losses) / len(losses)


# ---------------------------------------------------------------------------
# Combined MCAQ loss (paper Eq.20)
# ---------------------------------------------------------------------------


def smoothness_loss(bit_map) -> jnp.ndarray:
    """Lsmooth: per-edge mean total variation |db| over tile neighbors,
    averaged over scales (reference models/mcaq_yolo.py:86-107 — the per-edge
    mean keeps lambda2 comparable across grid sizes)."""
    if isinstance(bit_map, (list, tuple)):
        losses = [smoothness_loss(m) for m in bit_map]
        return sum(losses) / max(1, len(losses))
    if bit_map.ndim == 2:
        bit_map = bit_map[None]
    dx = jnp.abs(bit_map[:, 1:, :] - bit_map[:, :-1, :])
    dy = jnp.abs(bit_map[:, :, 1:] - bit_map[:, :, :-1])
    n_edges = dx.size + dy.size
    return (dx.sum() + dy.sum()) / max(1, n_edges)


def bit_budget_loss(avg_bits: jnp.ndarray, target_bits: float) -> jnp.ndarray:
    """Lbit = (b_bar - b_target)^2."""
    return (avg_bits - target_bits) ** 2


def mapper_l2(params) -> jnp.ndarray:
    """Lreg: L2 over the bit-mapper's weight MATRICES only (dim > 1 — biases
    and norm affine terms excluded; reference models/mcaq_yolo.py:191-202)."""
    total = jnp.zeros(())
    for leaf in jax.tree_util.tree_leaves(params):
        if leaf.ndim > 1:
            total = total + (leaf.astype(jnp.float32) ** 2).sum()
    return total


class MCAQYOLOLoss:
    """Combined loss (paper Eq.20):
        L = Ldet + l1 Lbit + l2 Lsmooth + l3 LKD + l4 Lreg
    Pure callable over jit-traceable inputs; weights come per-epoch from the
    CurriculumScheduler (reference curriculum.py:198-231)."""

    def __init__(self, num_classes: int = 80, target_bits: float = 4.0):
        self.detection_loss = DetectionLoss(num_classes)
        self.target_bits = target_bits

    def __call__(
        self,
        raw_maps: Sequence[jnp.ndarray],
        batch: Dict[str, jnp.ndarray],
        aux_info: Dict,
        teacher_maps: Optional[Sequence[jnp.ndarray]] = None,
        mapper_params=None,
        loss_weights: Optional[Dict[str, float]] = None,
        target_bits: Optional[float] = None,
    ):
        if loss_weights is None:
            loss_weights = {
                "detection": 1.0, "bit_budget": 0.01, "smoothness": 0.1,
                "distillation": 0.5, "regularization": 1e-4,
            }
        if target_bits is None:
            target_bits = self.target_bits

        loss_vec, items = self.detection_loss(
            raw_maps, batch["gt_boxes"], batch["gt_classes"], batch["gt_mask"]
        )
        loss_det = loss_vec.sum()

        loss_bit = bit_budget_loss(aux_info["avg_bits"], target_bits)
        loss_smooth = smoothness_loss(aux_info["bit_map"])

        loss_kd = jnp.zeros(())
        if teacher_maps is not None:
            loss_kd = kd_logit_loss(raw_maps, teacher_maps)
        if "kd_feature_loss" in aux_info:
            loss_kd = loss_kd + aux_info["kd_feature_loss"]

        loss_reg = mapper_l2(mapper_params) if mapper_params is not None else jnp.zeros(())

        total = (
            loss_weights["detection"] * loss_det
            + loss_weights["bit_budget"] * loss_bit
            + loss_weights["smoothness"] * loss_smooth
            + loss_weights["distillation"] * loss_kd
            + loss_weights["regularization"] * loss_reg
        )
        loss_dict = {
            "loss_det": loss_det,
            "loss_bit": loss_bit,
            "loss_smooth": loss_smooth,
            "loss_kd": loss_kd,
            "loss_reg": loss_reg,
            "loss_total": total,
            **items,
        }
        return total, loss_dict
