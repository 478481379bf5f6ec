"""
Fixed-shape non-maximum suppression in JAX.

The reference uses Ultralytics' dynamic-shape NMS (reference
inference.py:17-20, utils/evaluation.py:197-203); on TPU every shape must be
static, so this implementation:
  1. reduces per-anchor class scores to (best_score, best_class),
  2. pre-selects a static `pre_topk` candidate set by score (confidence
     gating by zeroing scores — no dynamic boolean compaction),
  3. runs EXACT greedy suppression: keep(i) = alive(i) and no
     higher-scored KEPT box overlaps i.  Two formulations, both equal to
     the sequential greedy result:
       * full-matrix Jacobi fixed point (small k): (k,k)@(k,) mat-vec
         sweeps until the keep vector stabilises (chain depth of the
         suppression graph) — not the k sequential steps a fori_loop
         greedy scan costs on TPU.
       * block-sequential scan (deployed k=1024): score-sorted blocks of
         128; each block does one on-the-fly (128,k) IoU against the
         VMEM-resident boxes + finalized earlier keeps, then iterates only
         its (128,128) tile.  Every IoU pair is touched exactly once —
         the fixed point's sweeps x (k,k)-matrix HBM re-reads (512 MB per
         sweep at bs=256) disappear.
  4. emits exactly `max_det` slots with a validity mask.

Everything is batched MXU/VPU work — no host sync, fully jit/vmap/pjit
compatible.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _iou_matrix(boxes: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """(N, 4) xyxy -> (N, N) IoU."""
    a = boxes[:, None, :]
    b = boxes[None, :, :]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area = jnp.clip(boxes[:, 2] - boxes[:, 0], 0, None) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0, None
    )
    return inter / (area[:, None] + area[None, :] - inter + eps)


_BLOCK = 128  # block size for the block-sequential greedy core


def _fixed_point_keep(nms_boxes: jnp.ndarray, alive: jnp.ndarray,
                      iou_threshold: float) -> jnp.ndarray:
    """Exact greedy keep-mask as a Jacobi fixed point on the full (k, k)
    suppression matrix.  keep(i) = alive(i) and no higher-scored KEPT box
    overlaps i; the update's unique fixed point equals sequential greedy
    (induction over score order).  Used for small k, where the matrix fits
    comfortably on-chip."""
    k = nms_boxes.shape[0]
    iou = _iou_matrix(nms_boxes)  # (k, k)
    idx = jnp.arange(k)

    # suppress[j, i]: candidate j (higher-scored, j < i) would suppress i
    # if j is kept.  bf16 is exact here: the mat-vec only needs "is the
    # count of kept suppressors nonzero", and TPU matmuls accumulate f32.
    suppress = ((iou > iou_threshold) & (idx[:, None] < idx[None, :])
                ).astype(jnp.bfloat16)

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < k)

    def body(state):
        keep, _, it = state
        n_sup = keep.astype(jnp.bfloat16) @ suppress  # (k,) kept-suppressors
        return alive & (n_sup < 0.5), keep, it + 1

    keep, _, _ = lax.while_loop(
        cond, body, (alive, jnp.zeros_like(alive), jnp.int32(0)))
    return keep


def _block_sequential_keep(nms_boxes: jnp.ndarray, alive: jnp.ndarray,
                           iou_threshold: float,
                           block: int = _BLOCK) -> jnp.ndarray:
    """Exact greedy keep-mask, block-sequential formulation.

    The full-matrix fixed point re-reads the (k, k) suppress matrix from
    HBM on EVERY sweep (vmapped over the batch: 512 MB/sweep at
    bs=256/k=1024) and needs chain-depth sweeps.  This version scans
    score-sorted blocks of `block` candidates: earlier blocks' keep
    decisions are FINAL when a block is processed, so each cross-block
    suppression test is one (block, k) IoU computed on the fly from the
    (k, 4) boxes (VMEM-resident), and only the tiny (block, block)
    within-block tile iterates.  Same O(k^2) IoU work, but each pair is
    touched exactly once — HBM traffic drops from sweeps x k^2 to ~k^2.
    Identical result to sequential greedy: induction over blocks in score
    order, then over candidates within a block (the within-block fixed
    point conditions on finalized earlier-block decisions via `alive_blk`).
    """
    k = nms_boxes.shape[0]
    n_blocks = k // block
    idx = jnp.arange(k)
    blk_idx = jnp.arange(block)

    def body(keep, s):
        start = s * block
        bboxes = lax.dynamic_slice(nms_boxes, (start, 0), (block, 4))
        alive_blk = lax.dynamic_slice(alive, (start,), (block,))

        # IoU of this block vs ALL candidates, recomputed from boxes
        a = bboxes[:, None, :]
        b = nms_boxes[None, :, :]
        lt = jnp.maximum(a[..., :2], b[..., :2])
        rb = jnp.minimum(a[..., 2:], b[..., 2:])
        wh = jnp.clip(rb - lt, 0.0, None)
        inter = wh[..., 0] * wh[..., 1]
        area_a = jnp.clip(bboxes[:, 2] - bboxes[:, 0], 0, None) * jnp.clip(
            bboxes[:, 3] - bboxes[:, 1], 0, None)
        area_b = jnp.clip(nms_boxes[:, 2] - nms_boxes[:, 0], 0, None) * \
            jnp.clip(nms_boxes[:, 3] - nms_boxes[:, 1], 0, None)
        iou = inter / (area_a[:, None] + area_b[None, :] - inter + 1e-7)
        over = iou > iou_threshold  # (block, k)

        # suppressed by any FINAL kept candidate of earlier blocks
        prev_kept = ((idx < start) & keep).astype(jnp.bfloat16)
        n_prev = over.astype(jnp.bfloat16) @ prev_kept  # (block,)
        alive_blk = alive_blk & (n_prev < 0.5)

        # within-block fixed point on the (block, block) tile
        over_blk = lax.dynamic_slice(over, (0, start), (block, block))
        sup_blk = (over_blk & (blk_idx[:, None] < blk_idx[None, :])
                   ).astype(jnp.bfloat16)

        def cond(st):
            kb, prev, it = st
            return jnp.any(kb != prev) & (it < block)

        def ibody(st):
            kb, _, it = st
            n_sup = kb.astype(jnp.bfloat16) @ sup_blk
            return alive_blk & (n_sup < 0.5), kb, it + 1

        keep_blk, _, _ = lax.while_loop(
            cond, ibody,
            (alive_blk, jnp.zeros_like(alive_blk), jnp.int32(0)))
        keep = lax.dynamic_update_slice(keep, keep_blk, (start,))
        return keep, None

    # keep starts as `alive`; entries at >= current block are provisional
    # and never read (prev_kept masks to idx < start) until finalized.
    keep, _ = lax.scan(body, alive, jnp.arange(n_blocks))
    return keep


def _greedy_keep(nms_boxes: jnp.ndarray, alive: jnp.ndarray,
                 iou_threshold: float) -> jnp.ndarray:
    """Dispatch: block-sequential core for large candidate sets (deployed
    pre_topk=1024), full-matrix fixed point for small/non-divisible k
    (tests, tiny anchor counts).  Both are exact sequential-greedy."""
    k = nms_boxes.shape[0]
    if k >= 2 * _BLOCK and k % _BLOCK == 0:
        return _block_sequential_keep(nms_boxes, alive, iou_threshold)
    return _fixed_point_keep(nms_boxes, alive, iou_threshold)


@partial(jax.jit, static_argnames=("max_det", "pre_topk", "class_agnostic"))
def non_max_suppression(
    boxes: jnp.ndarray,       # (A, 4) xyxy
    scores: jnp.ndarray,      # (A, nc) per-class scores (sigmoid)
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    max_det: int = 300,
    pre_topk: int = 1024,
    class_agnostic: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-image NMS.  Returns (boxes (max_det, 4), scores (max_det,),
    classes (max_det,), valid (max_det,) bool), score-sorted."""
    best_score = scores.max(axis=-1)
    best_class = scores.argmax(axis=-1).astype(jnp.int32)
    return nms_from_best(boxes, best_score, best_class, conf_threshold,
                         iou_threshold, max_det, pre_topk, class_agnostic)


@partial(jax.jit, static_argnames=("max_det", "pre_topk", "class_agnostic"))
def nms_from_best(
    boxes: jnp.ndarray,       # (A, 4) xyxy
    best_score: jnp.ndarray,  # (A,) per-anchor best-class score
    best_class: jnp.ndarray,  # (A,) int32 per-anchor best class
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    max_det: int = 300,
    pre_topk: int = 1024,
    class_agnostic: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS core on a pre-reduced (best_score, best_class) candidate set —
    the fused deployed path (`decode_and_nms`) computes the class max over
    logits inside decode so the (A, nc) score tensor is never
    materialized."""
    A = boxes.shape[0]

    # confidence gate by zeroing (static shape)
    best_score = jnp.where(best_score >= conf_threshold, best_score, 0.0)

    k = min(pre_topk, A)
    top_scores, top_idx = lax.top_k(best_score, k)
    return nms_from_topk(boxes[top_idx], top_scores, best_class[top_idx],
                         iou_threshold=iou_threshold, max_det=max_det,
                         class_agnostic=class_agnostic)


@partial(jax.jit, static_argnames=("max_det", "class_agnostic"))
def nms_from_topk(
    top_boxes: jnp.ndarray,    # (k, 4) xyxy, score-sorted descending
    top_scores: jnp.ndarray,   # (k,) gated scores (0 = below conf gate)
    top_classes: jnp.ndarray,  # (k,) int32
    iou_threshold: float = 0.45,
    max_det: int = 300,
    class_agnostic: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy suppression + compaction on an ALREADY-SELECTED candidate set
    (score-sorted, confidence gate applied by zeroing).  Split out of
    `nms_from_best` so the late-decode deployed path (`decode_and_nms`)
    can select candidates over LOGITS and DFL-decode only the k survivors
    before entering here."""
    k = top_boxes.shape[0]
    alive = top_scores > 0.0

    # class-aware IoU via coordinate offset (skipped when class_agnostic)
    if class_agnostic:
        nms_boxes = top_boxes
    else:
        # decoded corners can be negative (e.g. x1 = (point - lt)*stride at
        # image borders), so separation needs the full coordinate RANGE, not
        # just the max — otherwise adjacent-class boxes can still overlap
        # after offsetting and be wrongly cross-class suppressed.
        span = jnp.max(top_boxes) - jnp.min(top_boxes) + 1.0
        offset = top_classes.astype(top_boxes.dtype)[:, None] * span
        nms_boxes = top_boxes + offset

    keep = _greedy_keep(nms_boxes, alive, iou_threshold)

    # compact the survivors to the front, score order preserved
    final_scores = jnp.where(keep, top_scores, 0.0)
    out_scores, order = lax.top_k(final_scores, min(max_det, k))
    out_boxes = top_boxes[order]
    out_classes = top_classes[order]
    out_valid = out_scores > 0.0

    if max_det > k:  # pad (rare: max_det larger than candidate pool)
        pad = max_det - k
        out_scores = jnp.pad(out_scores, (0, pad))
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_classes = jnp.pad(out_classes, (0, pad))
        out_valid = jnp.pad(out_valid, (0, pad))
    return out_boxes, out_scores, out_classes, out_valid


def batched_nms(boxes, scores, **kwargs):
    """vmap over the batch: (B, A, 4), (B, A, nc) -> per-image padded
    detections."""
    fn = lambda b, s: non_max_suppression(b, s, **kwargs)
    return jax.vmap(fn)(boxes, scores)


def batched_nms_from_best(boxes, best_scores, best_classes, **kwargs):
    """vmap over the batch: (B, A, 4), (B, A), (B, A) int32 -> per-image
    padded detections (fused deployed path)."""
    fn = lambda b, s, c: nms_from_best(b, s, c, **kwargs)
    return jax.vmap(fn)(boxes, best_scores, best_classes)
