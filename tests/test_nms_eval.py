"""Fixed-shape NMS + mAP evaluation tests."""

import jax.numpy as jnp
import numpy as np

from mcaq_yolo_tpu.ops.nms import non_max_suppression
from mcaq_yolo_tpu.utils.evaluation import compute_map, _ap_from_pr


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray(
        [
            [0, 0, 10, 10],
            [1, 1, 11, 11],     # overlaps box 0, lower score -> suppressed
            [50, 50, 60, 60],   # separate
            [0, 0, 10, 10],     # different class, same box -> kept
        ],
        jnp.float32,
    )
    scores = np.zeros((4, 3), np.float32)
    scores[0, 0] = 0.9
    scores[1, 0] = 0.8
    scores[2, 1] = 0.7
    scores[3, 2] = 0.6
    b, s, c, v = non_max_suppression(
        boxes, jnp.asarray(scores), conf_threshold=0.25,
        iou_threshold=0.45, max_det=10, pre_topk=4,
    )
    kept = int(v.sum())
    assert kept == 3
    kept_scores = sorted(np.asarray(s)[np.asarray(v)].tolist(), reverse=True)
    np.testing.assert_allclose(kept_scores, [0.9, 0.7, 0.6], atol=1e-6)


def test_nms_class_agnostic():
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = np.zeros((2, 2), np.float32)
    scores[0, 0] = 0.9
    scores[1, 1] = 0.8
    _, _, _, v = non_max_suppression(
        boxes, jnp.asarray(scores), conf_threshold=0.1, iou_threshold=0.5,
        max_det=5, pre_topk=2, class_agnostic=True,
    )
    assert int(v.sum()) == 1


def test_nms_conf_gate():
    boxes = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    scores = jnp.asarray([[0.1]], jnp.float32)
    _, _, _, v = non_max_suppression(
        boxes, scores, conf_threshold=0.25, max_det=5, pre_topk=1
    )
    assert int(v.sum()) == 0


def _greedy_nms_numpy(boxes, scores, iou_thr):
    """Sequential greedy NMS (the torchvision/Ultralytics semantics the
    fixed-point iteration must reproduce exactly).  Single class."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    for i in order:
        ok = True
        for j in keep:
            a, b = boxes[i], boxes[j]
            lt = np.maximum(a[:2], b[:2])
            rb = np.minimum(a[2:], b[2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            ua = ((a[2] - a[0]) * (a[3] - a[1])
                  + (b[2] - b[0]) * (b[3] - b[1]) - inter)
            if inter / (ua + 1e-7) > iou_thr:
                ok = False
                break
        if ok:
            keep.append(i)
    return sorted(keep)


def test_nms_fixed_point_matches_sequential_greedy():
    """Randomized exactness check: the while-loop fixed-point suppression
    must equal sequential greedy NMS, including deep suppression chains."""
    rng = np.random.default_rng(0)
    for trial in range(8):
        n = 64
        # clustered boxes -> dense overlap graph with multi-level chains
        centers = rng.uniform(20, 80, (n, 2))
        wh = rng.uniform(10, 40, (n, 2))
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1)
        scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
        expected = _greedy_nms_numpy(boxes, scores, 0.45)

        b, s, c, v = non_max_suppression(
            jnp.asarray(boxes, jnp.float32), jnp.asarray(scores[:, None]),
            conf_threshold=0.25, iou_threshold=0.45, max_det=n, pre_topk=n,
            class_agnostic=True,
        )
        got_scores = np.sort(np.asarray(s)[np.asarray(v)])[::-1]
        exp_scores = np.sort(scores[expected])[::-1]
        np.testing.assert_allclose(got_scores, exp_scores, atol=1e-6,
                                   err_msg=f"trial {trial}")


def test_nms_block_sequential_matches_fixed_point_and_greedy():
    """The block-sequential core (deployed pre_topk=1024 path) must equal
    both the full-matrix fixed point and numpy sequential greedy on dense
    clustered candidate sets, including dead (conf-gated) entries."""
    from mcaq_yolo_tpu.ops.nms import (_block_sequential_keep,
                                       _fixed_point_keep)

    rng = np.random.default_rng(3)
    for k, tau in [(256, 0.45), (512, 0.3), (1024, 0.6)]:
        centers = rng.uniform(0, 200, (k, 2))
        wh = rng.uniform(20, 120, (k, 2))
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1)
        boxes = boxes.astype(np.float32)
        alive = rng.random(k) > 0.1

        fp = np.asarray(_fixed_point_keep(
            jnp.asarray(boxes), jnp.asarray(alive), tau))
        bl = np.asarray(_block_sequential_keep(
            jnp.asarray(boxes), jnp.asarray(alive), tau))
        assert (fp == bl).all(), f"k={k} tau={tau}"

        # against numpy sequential greedy (candidates already score-sorted
        # by construction: index order IS score order, dead entries skipped)
        scores = np.linspace(1.0, 0.5, k).astype(np.float32)
        scores[~alive] = 0.0
        expected = np.zeros(k, bool)
        expected[[i for i in _greedy_nms_numpy(boxes, scores, tau)
                  if alive[i]]] = True
        assert (bl == expected).all(), f"k={k} tau={tau} vs numpy"


def test_nms_suppression_chain():
    """A->B->C chain: A suppresses B, so C (overlapping only B) is kept.
    One-sweep approximations (YOLACT Fast-NMS) get this wrong."""
    boxes = jnp.asarray(
        [[0, 0, 10, 10],      # A, top score
         [4, 0, 14, 10],      # B: IoU(A,B)=6/14>0.45 -> suppressed by A
         [9, 0, 19, 10]],     # C: IoU(B,C)=5/15>0.45 iou w/ B, IoU(A,C)=1/19
        jnp.float32,
    )
    scores = jnp.asarray([[0.9], [0.8], [0.7]], jnp.float32)
    _, s, _, v = non_max_suppression(
        boxes, scores, conf_threshold=0.25, iou_threshold=0.3,
        max_det=3, pre_topk=3, class_agnostic=True,
    )
    kept = sorted(np.asarray(s)[np.asarray(v)].tolist(), reverse=True)
    np.testing.assert_allclose(kept, [0.9, 0.7], atol=1e-6)


def test_fused_decode_and_nms_matches_separate_path():
    """The fused deployed path (class-max over logits inside decode) must
    produce bitwise-identical detections to decode_predictions +
    batched_nms — sigmoid is monotone, so the per-anchor winner and its
    score are unchanged."""
    import jax

    from mcaq_yolo_tpu.models.yolo import (
        REG_MAX, decode_and_nms, decode_predictions)
    from mcaq_yolo_tpu.ops.nms import batched_nms

    rng = jax.random.PRNGKey(3)
    nc, B = 7, 2
    shapes = [(8, 8), (4, 4), (2, 2)]
    raw_maps = []
    for i, (h, w) in enumerate(shapes):
        rng, k = jax.random.split(rng)
        raw_maps.append(
            jax.random.normal(k, (B, h, w, 4 * REG_MAX + nc), jnp.float32) * 2
        )

    kw = dict(conf_threshold=0.25, iou_threshold=0.45, max_det=32,
              pre_topk=64)
    boxes, scores, _, _ = decode_predictions(raw_maps, nc)
    ref = batched_nms(boxes, scores, **kw)
    got = decode_and_nms(raw_maps, nc, **kw)
    for r, g, name in zip(ref, got, ("boxes", "scores", "classes", "valid")):
        r, g = np.asarray(r), np.asarray(g)
        valid = np.asarray(ref[3])
        np.testing.assert_array_equal(g[valid], r[valid], err_msg=name)


def test_ap_perfect_detection():
    preds = [
        {"boxes": np.array([[0, 0, 10, 10]]), "scores": np.array([0.9]),
         "classes": np.array([0])}
    ]
    targets = [{"boxes": np.array([[0, 0, 10, 10]]), "classes": np.array([0])}]
    res = compute_map(preds, targets, 0.5)
    assert res["map"] == 1.0


def test_ap_hallucinated_class_zero():
    """A detected-but-never-GT class contributes AP 0
    (reference evaluation.py:122-129)."""
    preds = [
        {"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]]),
         "scores": np.array([0.9, 0.8]), "classes": np.array([0, 5])}
    ]
    targets = [{"boxes": np.array([[0, 0, 10, 10]]), "classes": np.array([0])}]
    res = compute_map(preds, targets, 0.5)
    assert res["ap_per_class"][0] == 1.0
    assert res["ap_per_class"][5] == 0.0
    assert res["map"] == 0.5


def test_ap_greedy_single_match():
    """Two detections on one GT: only the higher-scored one is a TP."""
    preds = [
        {"boxes": np.array([[0, 0, 10, 10], [0, 0, 10, 10]]),
         "scores": np.array([0.9, 0.8]), "classes": np.array([0, 0])}
    ]
    targets = [{"boxes": np.array([[0, 0, 10, 10]]), "classes": np.array([0])}]
    res = compute_map(preds, targets, 0.5)
    # recall 1 at rank 1 but precision drops at rank 2: VOC all-point AP = 1.0
    assert res["map"] == 1.0


def test_ap_interp_methods():
    recall = np.array([0.5, 1.0])
    precision = np.array([1.0, 0.5])
    ap_voc = _ap_from_pr(recall, precision, "voc")
    ap_coco = _ap_from_pr(recall, precision, "coco")
    assert 0.5 <= ap_voc <= 1.0
    assert 0.5 <= ap_coco <= 1.0


def test_auto_pre_topk_sizing():
    """Serving pool is gate-driven (equivalence-certified minimums from
    evidence/r3/pretopk_equivalence.json), not max_det-driven: output
    slots are padded, above-gate candidates are what fill a pool."""
    from mcaq_yolo_tpu.inference import auto_pre_topk

    # deployed gate (conf >= 0.25): certified minimum 256 regardless of
    # requested max_det (measured worst case 23 candidates/image)
    assert auto_pre_topk(300) == 256
    assert auto_pre_topk(1000) == 256
    assert auto_pre_topk(1) == 256
    # low-confidence eval gates (conf < 0.25): 512 (measured worst case
    # 146 candidates/image at conf=0.001)
    assert auto_pre_topk(300, conf_threshold=0.001) == 512
    assert auto_pre_topk(5000, conf_threshold=0.1) == 512


def test_decode_and_nms_pool_stats():
    """with_pool_stats appends the per-image above-gate candidate count —
    the runtime side of the auto_pre_topk headroom contract."""
    from mcaq_yolo_tpu.models.yolo import REG_MAX, decode_and_nms

    rng = np.random.default_rng(0)
    nc = 4
    maps = [
        jnp.asarray(rng.normal(-8.0, 1.0, (2, s, s, 4 * REG_MAX + nc)),
                    jnp.float32)
        for s in (8, 4, 2)
    ]
    out = decode_and_nms(maps, nc, conf_threshold=0.25, max_det=10,
                         pre_topk=16, with_pool_stats=True)
    assert len(out) == 5
    boxes, scores, classes, valid, gated = out
    assert gated.shape == (2,) and gated.dtype == jnp.int32
    # gated counts the alive set exactly: same gate as `valid` before NMS
    assert int(gated.max()) <= 16
    # with logits centered at -8 the sigmoid scores sit well below the
    # gate, so nothing is alive and nothing is detected
    assert int(gated.sum()) == int(valid.sum()) == 0
