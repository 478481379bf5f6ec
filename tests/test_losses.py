"""Detection loss + TAL assigner semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mcaq_yolo_tpu.models.losses import (
    DetectionLoss,
    MCAQYOLOLoss,
    bit_budget_loss,
    ciou,
    kd_logit_loss,
    mapper_l2,
    smoothness_loss,
    task_aligned_assign,
)
from mcaq_yolo_tpu.models.yolo import REG_MAX


def _fake_raw_maps(B=2, img=64, nc=4, key=0):
    rng = np.random.default_rng(key)
    return [
        jnp.asarray(
            rng.normal(0, 0.1, (B, img // s, img // s, 4 * REG_MAX + nc)).astype(
                np.float32
            )
        )
        for s in (8, 16, 32)
    ]


def _fake_targets(B=2, M=8, img=64, nc=4, key=1):
    rng = np.random.default_rng(key)
    x1 = rng.uniform(0, img / 2, (B, M))
    y1 = rng.uniform(0, img / 2, (B, M))
    w = rng.uniform(8, img / 2, (B, M))
    h = rng.uniform(8, img / 2, (B, M))
    boxes = np.stack([x1, y1, np.minimum(x1 + w, img), np.minimum(y1 + h, img)], -1)
    classes = rng.integers(0, nc, (B, M))
    mask = np.zeros((B, M), bool)
    mask[:, :3] = True
    return (
        jnp.asarray(boxes, jnp.float32),
        jnp.asarray(classes, jnp.int32),
        jnp.asarray(mask),
    )


def test_ciou_identity_and_disjoint():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    assert float(ciou(a, a)[0]) > 0.99
    b = jnp.asarray([[100.0, 100.0, 110.0, 110.0]])
    assert float(ciou(a, b)[0]) < 0.0


def test_assigner_basic():
    """A GT box gets assigned anchors; padding GTs get none."""
    A = 64
    nc = 4
    pts = jnp.stack(
        jnp.meshgrid(jnp.arange(8) * 8 + 4.0, jnp.arange(8) * 8 + 4.0), -1
    ).reshape(-1, 2)
    pred_boxes = jnp.concatenate([pts - 6.0, pts + 6.0], -1)[None]  # (1, A, 4)
    pred_scores = jnp.full((1, A, nc), 0.5)
    gt_boxes = jnp.asarray([[[0.0, 0.0, 30.0, 30.0], [0, 0, 0, 0]]])
    gt_classes = jnp.asarray([[1, 0]], jnp.int32)
    gt_mask = jnp.asarray([[True, False]])

    tb, ts, fg = task_aligned_assign(
        pred_scores, pred_boxes, pts, gt_boxes, gt_classes, gt_mask
    )
    assert int(fg.sum()) > 0
    # assigned anchors carry the GT box and class 1
    sel = np.asarray(fg[0])
    assigned = np.asarray(tb[0])[sel]
    np.testing.assert_allclose(assigned, [[0, 0, 30, 30]] * sel.sum())
    assert np.asarray(ts[0])[sel][:, 1].min() > 0.0
    # anchors outside every GT are background
    outside = np.asarray(pts)[:, 0] > 35
    assert not np.asarray(fg[0])[outside].any()


def test_detection_loss_finite_and_differentiable():
    loss = DetectionLoss(num_classes=4)
    maps = _fake_raw_maps()
    gtb, gtc, gtm = _fake_targets()

    def f(maps):
        vec, items = loss(maps, gtb, gtc, gtm)
        return vec.sum()

    val, grads = jax.value_and_grad(f)(maps)
    assert np.isfinite(float(val))
    gn = sum(float(jnp.abs(g).sum()) for g in grads)
    assert gn > 0.0


def test_assigner_topk_matches_sort_scatter_reference():
    """The iterative masked-argmax top-k must select EXACTLY the anchors the
    sort+scatter formulation selects — including zero-align padding drops and
    exact ties (both resolve ties to the lowest index: lax.top_k is stable,
    argmax returns the first maximum)."""
    rng = np.random.default_rng(7)
    B, M, A, k, eps = 3, 16, 841, 10, 1e-9
    for trial in range(3):
        align = rng.random((B, M, A)).astype(np.float32)
        align[rng.random((B, M, A)) < 0.6] = 0.0  # masked-out candidates
        align[:, :, 5] = align[:, :, 17]  # exact tie pair
        align = jnp.asarray(align)

        tv, ti = jax.lax.top_k(align, k)
        sel = (tv > eps).astype(align.dtype)
        ref = (
            jnp.zeros_like(align)
            .at[np.arange(B)[:, None, None], np.arange(M)[None, :, None], ti]
            .add(sel)
            > 0
        )

        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, A), 2)
        got = jnp.zeros(align.shape, jnp.bool_)
        work = align
        for _ in range(k):
            idx = jnp.argmax(work, axis=-1)
            val = jnp.max(work, axis=-1)
            pick = (iota == idx[..., None]) & (val > eps)[..., None]
            got = got | pick
            work = jnp.where(pick, -1.0, work)
        assert bool(jnp.all(ref == got)), f"selection diverged (trial {trial})"


def test_assigner_targets_carry_no_gradient():
    """The TAL assigner is a target builder: the reference calls it on
    DETACHED scores/boxes (Ultralytics v8DetectionLoss), so d(target)/d(pred)
    must be exactly zero — gradients reach predictions only through the
    box/cls/dfl losses themselves."""
    loss = DetectionLoss(num_classes=4)
    maps = _fake_raw_maps()
    gtb, gtc, gtm = _fake_targets()

    def target_mass(maps):
        # reconstruct the assigner inputs exactly as DetectionLoss does,
        # then reduce the targets: any grad => assignment not detached
        from mcaq_yolo_tpu.models.losses import task_aligned_assign as tal
        from mcaq_yolo_tpu.models.yolo import dfl_decode, make_anchors

        B = maps[0].shape[0]
        feat_shapes = [m.shape[1:3] for m in maps]
        points, strides = make_anchors(feat_shapes)
        flat = jnp.concatenate(
            [m.reshape(B, -1, m.shape[-1]) for m in maps], axis=1
        ).astype(jnp.float32)
        pred_dist = flat[..., : 4 * REG_MAX].reshape(B, -1, 4, REG_MAX)
        scores = jax.nn.sigmoid(flat[..., 4 * REG_MAX:])
        dist = dfl_decode(pred_dist)
        pb = jnp.concatenate(
            [points[None] - dist[..., :2], points[None] + dist[..., 2:]],
            axis=-1,
        )
        tb, ts, fg = tal(
            jax.lax.stop_gradient(scores),
            jax.lax.stop_gradient(pb * strides[None]),
            points * strides, gtb, gtc, gtm,
        )
        return ts.sum() + tb.sum()

    grads = jax.grad(target_mass)(maps)
    assert sum(float(jnp.abs(g).sum()) for g in grads) == 0.0

    # and the full loss still differentiates w.r.t. predictions
    val, grads = jax.value_and_grad(
        lambda m: loss(m, gtb, gtc, gtm)[0].sum()
    )(maps)
    assert np.isfinite(float(val))
    assert sum(float(jnp.abs(g).sum()) for g in grads) > 0.0


def test_detection_loss_empty_targets():
    """No GT at all: box/dfl zero, cls pushes scores down, still finite."""
    loss = DetectionLoss(num_classes=4)
    maps = _fake_raw_maps()
    B, M = 2, 8
    gtb = jnp.zeros((B, M, 4))
    gtc = jnp.zeros((B, M), jnp.int32)
    gtm = jnp.zeros((B, M), bool)
    vec, items = loss(maps, gtb, gtc, gtm)
    assert np.isfinite(float(vec.sum()))
    assert float(items["num_fg"]) == 0.0
    assert float(items["box_loss"]) == 0.0


def test_smoothness_and_bit_budget():
    flat = jnp.full((1, 4, 4), 4.0)
    assert float(smoothness_loss(flat)) == 0.0
    checker = jnp.asarray(np.indices((4, 4)).sum(0) % 2, jnp.float32)[None] * 6 + 2
    assert float(smoothness_loss(checker)) == 6.0  # every edge |db| = 6
    assert float(bit_budget_loss(jnp.float32(6.0), 4.0)) == 4.0


def test_kd_and_reg():
    maps = _fake_raw_maps(key=2)
    assert float(kd_logit_loss(maps, maps)) == 0.0
    other = _fake_raw_maps(key=3)
    assert float(kd_logit_loss(maps, other)) > 0.0
    params = {"a": jnp.ones((3, 3)), "b": jnp.ones((5,))}
    assert float(mapper_l2(params)) == 9.0  # matrices only


def test_combined_loss():
    loss = MCAQYOLOLoss(num_classes=4, target_bits=4.0)
    maps = _fake_raw_maps()
    gtb, gtc, gtm = _fake_targets()
    aux = {
        "avg_bits": jnp.float32(5.0),
        "bit_map": [jnp.full((2, 4, 4), 5.0)],
    }
    batch = {"gt_boxes": gtb, "gt_classes": gtc, "gt_mask": gtm}
    total, d = loss(maps, batch, aux)
    assert np.isfinite(float(total))
    assert float(d["loss_bit"]) == 1.0
    assert float(d["loss_smooth"]) == 0.0
