"""
YOLOv8 detection model family (n/s/m/l/x) in Flax linen, NHWC.

The reference obtains this network from Ultralytics
(reference models/mcaq_yolo.py:243-250); here it is a native JAX
implementation with explicit structure: the backbone RETURNS the C3/C4/C5
feature maps (so MCAQ can be inserted functionally between backbone and
neck — no forward hooks), the PAN neck consumes them, and the Detect head
emits raw per-scale maps plus a DFL-decoded prediction tensor at eval.

Scaling follows YOLOv8's depth/width/max-channel multiples; channel counts
are rounded to multiples of 8 — on TPU the channel (lane) dimension packs
into 128-wide registers, and multiples of 8 keep every conv MXU-tileable.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import C2f, ConvBnSiLU, SPPF, upsample2x


def normalize_image(x: jnp.ndarray) -> jnp.ndarray:
    """Accept uint8 (0..255) or float ([0,1]) images; normalize in-graph.

    The data pipeline ships uint8 batches (4x smaller host->device
    transfers); the /255 runs on device and XLA fuses it into the first
    conv.  Float inputs pass through unchanged (tests / torch-parity
    harnesses feed floats directly)."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        return x.astype(jnp.float32) / 255.0
    return x

# variant: (depth_mult, width_mult, max_channels)
VARIANTS = {
    "yolov8n": (0.33, 0.25, 1024),
    "yolov8s": (0.33, 0.50, 1024),
    "yolov8m": (0.67, 0.75, 768),
    "yolov8l": (1.00, 1.00, 512),
    "yolov8x": (1.00, 1.25, 512),
}

REG_MAX = 16
STRIDES = (8, 16, 32)


def _ch(base: int, width: float, max_ch: int) -> int:
    """Scaled channel count, rounded to a multiple of 8."""
    return int(math.ceil(min(base, max_ch) * width / 8) * 8)


def _n(base: int, depth: float) -> int:
    return max(round(base * depth), 1)


def variant_channels(variant: str) -> Tuple[int, int, int]:
    """(C3, C4, C5) channel counts for a variant — the per-scale quantizer
    shapes depend on these."""
    d, w, mc = VARIANTS[variant]
    return _ch(256, w, mc), _ch(512, w, mc), _ch(1024, w, mc)


class YOLOv8Backbone(nn.Module):
    """Stem + stages P1..P5 with SPPF; returns (C3, C4, C5) — the FPN inputs
    the reference quantizes via hooks at indices [4, 6, 9]
    (reference models/mcaq_yolo.py:351-400)."""

    variant: str = "yolov8n"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False):
        d, w, mc = VARIANTS[self.variant]
        dt = self.dtype
        x = x.astype(dt)
        x = ConvBnSiLU(_ch(64, w, mc), 3, 2, dtype=dt)(x, training)       # 0: P1/2
        x = ConvBnSiLU(_ch(128, w, mc), 3, 2, dtype=dt)(x, training)      # 1: P2/4
        x = C2f(_ch(128, w, mc), _n(3, d), True, dtype=dt)(x, training)   # 2
        x = ConvBnSiLU(_ch(256, w, mc), 3, 2, dtype=dt)(x, training)      # 3: P3/8
        c3 = C2f(_ch(256, w, mc), _n(6, d), True, dtype=dt)(x, training)  # 4  -> C3
        x = ConvBnSiLU(_ch(512, w, mc), 3, 2, dtype=dt)(c3, training)     # 5: P4/16
        c4 = C2f(_ch(512, w, mc), _n(6, d), True, dtype=dt)(x, training)  # 6  -> C4
        x = ConvBnSiLU(_ch(1024, w, mc), 3, 2, dtype=dt)(c4, training)    # 7: P5/32
        x = C2f(_ch(1024, w, mc), _n(3, d), True, dtype=dt)(x, training)  # 8
        c5 = SPPF(_ch(1024, w, mc), dtype=dt)(x, training)                # 9  -> C5
        return c3, c4, c5


class YOLOv8Neck(nn.Module):
    """PAN feature pyramid: top-down then bottom-up, C2f fusion blocks."""

    variant: str = "yolov8n"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c3, c4, c5, training: bool = False):
        d, w, mc = VARIANTS[self.variant]
        dt = self.dtype
        c3, c4, c5 = c3.astype(dt), c4.astype(dt), c5.astype(dt)
        # top-down
        p4 = C2f(_ch(512, w, mc), _n(3, d), False, dtype=dt)(
            jnp.concatenate([upsample2x(c5), c4], axis=-1), training
        )  # 12
        p3 = C2f(_ch(256, w, mc), _n(3, d), False, dtype=dt)(
            jnp.concatenate([upsample2x(p4), c3], axis=-1), training
        )  # 15 -> P3 out
        # bottom-up
        n4 = C2f(_ch(512, w, mc), _n(3, d), False, dtype=dt)(
            jnp.concatenate(
                [ConvBnSiLU(_ch(256, w, mc), 3, 2, dtype=dt)(p3, training), p4],
                axis=-1,
            ),
            training,
        )  # 18 -> P4 out
        n5 = C2f(_ch(1024, w, mc), _n(3, d), False, dtype=dt)(
            jnp.concatenate(
                [ConvBnSiLU(_ch(512, w, mc), 3, 2, dtype=dt)(n4, training), c5],
                axis=-1,
            ),
            training,
        )  # 21 -> P5 out
        return p3, n4, n5


class DetectHead(nn.Module):
    """Decoupled anchor-free Detect head with DFL box regression.

    Per scale: a box branch (2x Conv3x3 -> 1x1 conv, 4*REG_MAX channels) and
    a cls branch (2x Conv3x3 -> 1x1 conv, nc channels).  Returns the raw
    per-scale maps (B, H, W, 4*REG_MAX + nc) — the KD-logit targets and the
    training-loss inputs (reference _extract_raw_maps, models/mcaq_yolo.py:21-36).
    """

    num_classes: int = 80
    variant: str = "yolov8n"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], training: bool = False):
        d, w, mc = VARIANTS[self.variant]
        c3ch = _ch(256, w, mc)
        c_box = max(16, c3ch // 4, 4 * REG_MAX)
        c_cls = max(c3ch, min(self.num_classes, 100))

        outs = []
        for i, f in enumerate(feats):
            # stability init for the 1x1 heads (analogue of Ultralytics'
            # bias_init): box bias 1.0; cls bias set so initial P(cls) is
            # ~ 5 / (nc * anchors-per-image-at-this-scale)
            stride = STRIDES[i]
            cls_prior = 5.0 / self.num_classes / ((640 / stride) ** 2)
            cls_bias = float(-math.log((1.0 - cls_prior) / cls_prior))

            f = f.astype(self.dtype)
            b = ConvBnSiLU(c_box, 3, name=f"box{i}_conv0", dtype=self.dtype)(f, training)
            b = ConvBnSiLU(c_box, 3, name=f"box{i}_conv1", dtype=self.dtype)(b, training)
            b = nn.Conv(
                4 * REG_MAX, (1, 1),
                bias_init=nn.initializers.constant(1.0),
                name=f"box{i}_out",
                dtype=self.dtype, param_dtype=jnp.float32,
            )(b)

            c = ConvBnSiLU(c_cls, 3, name=f"cls{i}_conv0", dtype=self.dtype)(f, training)
            c = ConvBnSiLU(c_cls, 3, name=f"cls{i}_conv1", dtype=self.dtype)(c, training)
            c = nn.Conv(
                self.num_classes, (1, 1),
                bias_init=nn.initializers.constant(cls_bias),
                name=f"cls{i}_out",
                dtype=self.dtype, param_dtype=jnp.float32,
            )(c)

            # raw maps emitted in float32: the loss, DFL decode and KD
            # targets are precision-sensitive
            outs.append(jnp.concatenate([b, c], axis=-1).astype(jnp.float32))
        return outs


def make_anchors(
    feat_shapes: Sequence[Tuple[int, int]], strides: Sequence[int] = STRIDES,
    offset: float = 0.5,
):
    """Anchor points (cell centers, feature units) + per-anchor stride.

    Returns (points (A, 2) [x, y], strides (A, 1)) concatenated over scales
    in scale order — static shapes, computed at trace time."""
    points, strs = [], []
    for (h, w), s in zip(feat_shapes, strides):
        xv = jnp.arange(w, dtype=jnp.float32) + offset
        yv = jnp.arange(h, dtype=jnp.float32) + offset
        xx, yy = jnp.meshgrid(xv, yv)
        points.append(jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1))
        strs.append(jnp.full((h * w, 1), float(s)))
    return jnp.concatenate(points, axis=0), jnp.concatenate(strs, axis=0)


def dfl_decode(box_dist: jnp.ndarray) -> jnp.ndarray:
    """DFL expectation: (..., 4, REG_MAX) logits -> (..., 4) distances.

    softmax + arange dot — a tiny matmul XLA maps onto the MXU."""
    p = jax.nn.softmax(box_dist, axis=-1)
    bins = jnp.arange(REG_MAX, dtype=p.dtype)
    return (p * bins).sum(axis=-1)


def decode_predictions(
    raw_maps: Sequence[jnp.ndarray], num_classes: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flatten per-scale raw maps into anchor-major tensors and decode boxes.

    Returns (boxes_xyxy (B, A, 4) in input pixels, scores (B, A, nc) sigmoid,
    anchor points (A, 2), strides (A, 1))."""
    B = raw_maps[0].shape[0]
    feat_shapes = [m.shape[1:3] for m in raw_maps]
    points, strides = make_anchors(feat_shapes)

    flat = jnp.concatenate(
        [m.reshape(B, -1, m.shape[-1]) for m in raw_maps], axis=1
    )  # (B, A, 4*REG_MAX + nc)
    box_dist = flat[..., : 4 * REG_MAX].reshape(B, -1, 4, REG_MAX)
    cls_logits = flat[..., 4 * REG_MAX:]

    dist = dfl_decode(box_dist)  # (B, A, 4) ltrb in feature units
    lt, rb = dist[..., :2], dist[..., 2:]
    x1y1 = (points[None] - lt) * strides[None]
    x2y2 = (points[None] + rb) * strides[None]
    boxes = jnp.concatenate([x1y1, x2y2], axis=-1)
    scores = jax.nn.sigmoid(cls_logits)
    return boxes, scores, points, strides


def decode_and_nms(
    raw_maps: Sequence[jnp.ndarray],
    num_classes: int,
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    max_det: int = 300,
    pre_topk: int = 1024,
    class_agnostic: bool = False,
    with_pool_stats: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Fused deployed-path decode + NMS (the program `Predictor`/`eval_step`
    run; reference inference.py:194-243 runs decode and Ultralytics NMS as
    separate passes).

    with_pool_stats=True appends a (B,) int32 per-image count of above-gate
    candidates INSIDE the pool — the runtime side of the `auto_pre_topk`
    headroom contract: gated_count == pre_topk means the pool saturated and
    above-gate candidates may have been cut (equivalence to a full-pool NMS
    no longer certified); Predictor warns when it sees that.

    The per-anchor best class is reduced over LOGITS before the sigmoid
    (sigmoid is monotone, so winners and scores are identical to
    decode_predictions + batched_nms) — the (B, A, nc) per-class score
    tensor is never materialized, which at bs=128/nc=80 removes a 344 MB
    HBM round-trip from every forward.

    LATE DECODE, MXU-GATHERED: candidate selection (top-k over the
    per-anchor best logit — monotone with the sigmoid score, so the
    selected set and its ranking are identical to selecting over scores)
    runs BEFORE box decode, and the DFL softmax + anchor arithmetic touch
    only the k selected anchors instead of all A.  Two TPU-specific
    lowering choices (measured at bs=256/640px/k=256, r4):
      * the candidate rows are pulled out with PER-SCALE ONE-HOT MATMULS
        (onehot(top_idx - scale_offset) @ flat_scale, summed over scales)
        instead of `take_along_axis` — generic gathers cost 12.6 ms here
        while the equivalent (B,k,a)x(B,a,D) batched matmuls ride the MXU;
        exact, since each top_idx row lands in exactly one scale's offset
        window and its one-hot row has a single unit entry (a float sum of
        one element).  Per-scale (not one big concat) also avoids
        materializing the 619 MB (B, A, D) copy (12.7 -> 11.3 ms total).
      * per-anchor ARGMAX over all A anchors is never computed: the class
        id is recovered from the gathered (B, k, nc) logits of the k
        survivors (same rows, so identical winners), removing the second
        full read of the (B, A, nc) logit tensor (7.0 -> 4.1 ms for the
        remaining single max pass).
    Equivalence to the decode-everything path is pinned bitwise by
    tests/test_nms_eval.py::test_fused_decode_and_nms_matches_separate_path."""
    from ..ops.nms import nms_from_topk

    B = raw_maps[0].shape[0]
    feat_shapes = [m.shape[1:3] for m in raw_maps]
    points, strides = make_anchors(feat_shapes)

    best_logit = jnp.concatenate(
        [m.reshape(B, -1, m.shape[-1])[..., 4 * REG_MAX:].max(axis=-1)
         .astype(jnp.float32) for m in raw_maps], axis=1)  # (B, A)

    A = best_logit.shape[1]
    k = min(pre_topk, A)
    top_logit, top_idx = jax.lax.top_k(best_logit, k)  # (B, k)
    top_scores = jax.nn.sigmoid(top_logit)
    # confidence gate by zeroing (below-gate anchors sort to the tail of
    # the top-k in both orderings, so gating after selection keeps the
    # alive set identical to gate-then-select)
    top_scores = jnp.where(top_scores >= conf_threshold, top_scores, 0.0)

    # per-scale one-hot row selection on the MXU (see docstring); f32
    # accumulation of a single unit entry is exact in every input dtype.
    # Precision HIGHEST: with the default precision XLA lowers f32 matmul
    # OPERANDS through bf16 passes on the MXU, which would truncate the
    # selected rows' mantissas — the gather must be bitwise, not just
    # structurally, equivalent to take_along_axis (the deployed bf16 path
    # is native single-pass either way, so this costs nothing there)
    sel_all = 0.0  # weakly typed: the sum keeps the raw maps' dtype
    start = 0
    for m in raw_maps:
        flat = m.reshape(B, -1, m.shape[-1])  # (B, a, 4*REG_MAX + nc)
        a = flat.shape[1]
        onehot = ((top_idx[..., None] - start) ==
                  jnp.arange(a, dtype=jnp.int32)[None, None, :])
        sel_all = sel_all + jnp.einsum(
            "bka,bad->bkd", onehot.astype(flat.dtype), flat,
            precision=jax.lax.Precision.HIGHEST)
        start += a
    top_classes = sel_all[..., 4 * REG_MAX:].argmax(axis=-1).astype(jnp.int32)

    # anchor points/strides of the survivors: a (A, 3) table is tiny, the
    # (B, k, 3) gather from it is output-bound and cheap
    anc = jnp.concatenate([points, strides], axis=-1)   # (A, 3) f32
    ps = anc[top_idx]
    pts, std = ps[..., :2], ps[..., 2:]

    dist = dfl_decode(sel_all[..., : 4 * REG_MAX]
                      .reshape(B, k, 4, REG_MAX))   # (B, k, 4)
    x1y1 = (pts - dist[..., :2]) * std
    x2y2 = (pts + dist[..., 2:]) * std
    top_boxes = jnp.concatenate([x1y1, x2y2], axis=-1)

    fn = lambda b, s, c: nms_from_topk(
        b, s, c, iou_threshold=iou_threshold, max_det=max_det,
        class_agnostic=class_agnostic)
    det = jax.vmap(fn)(top_boxes, top_scores, top_classes)
    if with_pool_stats:
        gated_count = (top_scores > 0.0).sum(axis=-1).astype(jnp.int32)
        return det + (gated_count,)
    return det


class YOLOv8(nn.Module):
    """Plain (non-MCAQ) YOLOv8 — used as the FP32 teacher and as the base
    ablation arm.  Returns the raw per-scale Detect maps."""

    variant: str = "yolov8n"
    num_classes: int = 80
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = YOLOv8Backbone(self.variant, dtype=self.dtype)
        self.neck = YOLOv8Neck(self.variant, dtype=self.dtype)
        self.head = DetectHead(self.num_classes, self.variant, dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, training: bool = False):
        c3, c4, c5 = self.backbone(normalize_image(x), training)
        p3, p4, p5 = self.neck(c3, c4, c5, training)
        return self.head([p3, p4, p5], training)

    def features(self, x: jnp.ndarray, training: bool = False):
        """Backbone features only — teacher-side feature KD taps
        (the reference registers teacher hooks at the student's backbone
        indices, train.py:225-236)."""
        return self.backbone(normalize_image(x), training)
