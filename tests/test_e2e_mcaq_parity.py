"""End-to-end MCAQ inference-path parity vs the reference's PyTorch core.

The reference's full Trainer cannot run in this environment (it requires
the `ultralytics` package for the detector/loss/data stack — SURVEY.md §1),
but its CORE — the quantizer that defines the MCAQ inference path — imports
fine.  This test therefore assembles the reference's own inference
semantics end-to-end:

    torch arm:  Ultralytics-topology torch detector (tests/torch_yolo_fixture)
                + the REFERENCE SpatialAdaptiveQuantization applied at
                C3/C4/C5 (its hook points, reference models/mcaq_yolo.py:459-473)
    jax arm:    mcaq_yolo_tpu.MCAQYOLO

with SHARED weights (torch->JAX converter), SHARED calibration (both arms
EMA-calibrate on the same batch, then freeze), SHARED bit maps (produced by
our pipeline, injected into both arms), and SHARED decode+NMS (ours, fed
raw maps from both).  Any difference isolates to the quantize+detect
stacks.  Asserts detection-level agreement and mAP@50-95 agreement on a
synthetic val set — the BASELINE quality-parity contract at the metric
level (VERDICT r1 item 4), as far as it can be carried without ultralytics.

Numerics: the two conv stacks agree to ~2e-4 (test_weights_io), and a
feature value that close to a rounding boundary can flip by ONE
quantization step in either arm — so raw maps are compared by quantile,
and the headline assertions are detection boxes/classes and mAP.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from torch_yolo_fixture import (  # noqa: E402
    TYOLOv8n,
    randomize_bn_stats,
    ultralytics_state_dict,
)

from mcaq_yolo_tpu.models import MCAQYOLO  # noqa: E402
from mcaq_yolo_tpu.models.weights_io import load_pretrained_into  # noqa: E402
from mcaq_yolo_tpu.models.yolo import decode_predictions  # noqa: E402
from mcaq_yolo_tpu.ops.nms import batched_nms  # noqa: E402
from mcaq_yolo_tpu.utils.evaluation import (  # noqa: E402
    compute_map50_95,
    detections_to_numpy,
)

# full-model torch-vs-JAX parity - excluded from the CI fast gate
pytestmark = pytest.mark.slow

NC = 4
IMG = 128
B = 2


@pytest.fixture(scope="module")
def ref_quant_cls():
    """Import the reference's SpatialAdaptiveQuantization from
    /root/reference (read-only).  skimage is absent in this env; only its
    LBP function is referenced by the reference's morphology module, which
    the core __init__ pulls in — stub exactly that symbol."""
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        feat = types.ModuleType("skimage.feature")

        def _lbp_stub(*a, **k):  # pragma: no cover - never called here
            raise NotImplementedError("skimage stub: LBP not available")

        feat.local_binary_pattern = _lbp_stub
        sk.feature = feat
        sys.modules["skimage"] = sk
        sys.modules["skimage.feature"] = feat
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from mcaq_yolo.core.quantization import SpatialAdaptiveQuantization

    return SpatialAdaptiveQuantization


@pytest.fixture(scope="module")
def arms(ref_quant_cls):
    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    tmodel = TYOLOv8n(nc=NC)
    with torch.no_grad():
        randomize_bn_stats(tmodel, gen)
    tmodel.eval()
    sd = ultralytics_state_dict(tmodel)

    # smooth_transitions=True: the DEPLOYED configuration — the Eq.19 soft
    # mask participates in both arms (weights converted below)
    model = MCAQYOLO(
        variant="yolov8n", num_classes=NC, bit_mapping="linear",
        smooth_transitions=True, calibration_mode="minmax",
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32),
        training=False,
    )
    variables = load_pretrained_into(variables, sd)

    # shared inputs: calibration batch + eval batch
    x_cal = torch.randn(B, 3, IMG, IMG, generator=gen) * 0.5 + 0.5
    x_val = torch.randn(B, 3, IMG, IMG, generator=gen) * 0.5 + 0.5
    xj_cal = jnp.asarray(np.transpose(x_cal.numpy(), (0, 2, 3, 1)))
    xj_val = jnp.asarray(np.transpose(x_val.numpy(), (0, 2, 3, 1)))

    # --- calibrate BOTH arms on the same batch, then freeze -------------
    # jax: one stats-updating forward (first batch -> direct assignment,
    # same rule as the reference's EMA first step)
    _, updates = model.apply(
        variables, xj_cal, temperature=1.0, quantize=True, training=False,
        update_stats=True, mutable=["quant_stats", "batch_stats"],
    )
    qs = jax.device_get(updates["quant_stats"])
    for k in qs:
        qs[k] = dict(qs[k], frozen=np.asarray(True))
    variables = dict(variables, quant_stats=qs)

    with torch.no_grad():
        c3, c4, c5 = tmodel.backbone_features(x_cal)
    ref_quants = []
    for i, feat in enumerate((c3, c4, c5)):
        q = ref_quant_cls(per_channel=True, smooth_transitions=True)
        q.eval()
        # convert our soft-mask conv weights into the reference module so
        # the Eq.19 mask is identical in both arms (flax (kh,kw,in,out) ->
        # torch (out,in,kh,kw); same mapping the bitwise harness validates)
        mp = variables["params"][f"quantizer_p{i + 3}"]["soft_mask"]
        with torch.no_grad():
            for tconv, name in ((q.soft_mask.net[0], "Conv_0"),
                                (q.soft_mask.net[2], "Conv_1")):
                tconv.weight.copy_(torch.from_numpy(np.ascontiguousarray(
                    np.transpose(np.asarray(mp[name]["kernel"]),
                                 (3, 2, 0, 1)))))
                tconv.bias.copy_(torch.from_numpy(
                    np.asarray(mp[name]["bias"])))
        q.update_running_stats(feat)
        q.freeze_calibration()
        ref_quants.append(q)

    return tmodel, ref_quants, model, variables, xj_val, x_val


def _jax_forward_given_maps(model, variables, images, maps):
    def fwd(mdl):
        feats = mdl.backbone(images, False)
        feats_q = [
            mdl.quantizers[i](f, maps[i], training=False)
            for i, f in enumerate(feats)
        ]
        p3, p4, p5 = mdl.neck(*feats_q, training=False)
        return mdl.head([p3, p4, p5], False)

    return model.apply(variables, method=lambda mdl: fwd(mdl))


def test_quantizer_stats_agree(arms):
    """Both arms calibrated on the same batch must hold the same ranges."""
    _, ref_quants, _, variables, _, _ = arms
    for i, name in enumerate(("quantizer_p3", "quantizer_p4", "quantizer_p5")):
        qmin_j = np.asarray(variables["quant_stats"][name]["running_min"])
        qmax_j = np.asarray(variables["quant_stats"][name]["running_max"])
        qmin_t = ref_quants[i].running_min.numpy().reshape(-1)
        qmax_t = ref_quants[i].running_max.numpy().reshape(-1)
        np.testing.assert_allclose(qmin_j, qmin_t, atol=3e-4, rtol=1e-4)
        np.testing.assert_allclose(qmax_j, qmax_t, atol=3e-4, rtol=1e-4)


def test_end_to_end_detection_and_map_parity(arms):
    tmodel, ref_quants, model, variables, xj_val, x_val = arms

    # our pipeline's bit allocation (eval: rounded integers per tile)
    _, aux = model.apply(
        variables, xj_val, temperature=1.0, quantize=True, training=False,
    )
    maps = [jnp.asarray(np.asarray(m)) for m in aux["bit_map"]]

    raw_j = _jax_forward_given_maps(model, variables, xj_val, maps)

    maps_t = [torch.from_numpy(np.asarray(m).astype(np.float32)) for m in maps]

    def quant_fn(feat, i):
        return ref_quants[i](feat, maps_t[i], training=False)

    with torch.no_grad():
        raw_t = tmodel(x_val, quant_fn=quant_fn)

    # raw maps: overwhelmingly close; isolated one-quant-step flips allowed
    for i, (rj, rt) in enumerate(zip(raw_j, raw_t)):
        rj = np.transpose(np.asarray(rj), (0, 3, 1, 2))
        rt = rt.numpy()
        err = np.abs(rj - rt)
        assert np.quantile(err, 0.99) < 5e-3, (
            f"scale {i}: p99 err {np.quantile(err, 0.99)}"
        )

    # detections through the SAME decode+NMS
    def detect(raw_nhwc):
        boxes, scores, _, _ = decode_predictions(raw_nhwc, NC)
        return jax.device_get(batched_nms(
            boxes, scores, conf_threshold=0.25, iou_threshold=0.45,
            max_det=50,
        ))

    det_j = detect(raw_j)
    det_t = detect([
        jnp.asarray(np.transpose(r.numpy(), (0, 2, 3, 1))) for r in raw_t
    ])
    preds_j = detections_to_numpy(*det_j)
    preds_t = detections_to_numpy(*det_t)

    # IoU-matched comparison (index alignment is brittle: a one-quant-step
    # flip can swap which of two near-duplicate anchors survives NMS — the
    # boxes then differ by exactly one stride while the detection set is
    # semantically identical)
    n_j = sum(len(p["boxes"]) for p in preds_j)
    n_t = sum(len(p["boxes"]) for p in preds_t)
    assert abs(n_j - n_t) <= max(1, int(0.05 * max(n_j, n_t))), (
        f"detection count {n_j} vs {n_t}"
    )

    def iou(a, b):
        lt = np.maximum(a[:, None, :2], b[None, :, :2])
        rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
        inter = np.prod(np.clip(rb - lt, 0, None), axis=-1)
        area_a = np.prod(a[:, 2:] - a[:, :2], axis=-1)
        area_b = np.prod(b[:, 2:] - b[:, :2], axis=-1)
        return inter / np.clip(area_a[:, None] + area_b[None] - inter, 1e-9, None)

    matched, total = 0, 0
    for pj, pt in zip(preds_j, preds_t):
        total += len(pj["boxes"])
        if not len(pj["boxes"]) or not len(pt["boxes"]):
            continue
        m = iou(pj["boxes"], pt["boxes"])
        same_cls = pj["classes"][:, None] == pt["classes"][None, :]
        close_score = np.abs(
            pj["scores"][:, None] - pt["scores"][None, :]) < 0.02
        matched += int(((m > 0.8) & same_cls & close_score).any(axis=1).sum())
    # a handful of conf-threshold crossers (score ~0.25 +- one quant step)
    # may appear in only one arm; the mAP assertion below bounds their
    # metric impact
    assert total == 0 or matched / total >= 0.9, (
        f"only {matched}/{total} detections IoU-matched across arms"
    )

    # metric-level agreement on synthetic GT (values are arbitrary for a
    # random-weight model; EQUALITY between arms is the contract)
    rng = np.random.default_rng(0)
    targets = []
    for _ in range(B):
        # (3 boxes, 2 points, 2 coords) sorted along the point axis gives
        # [xmin,ymin] then [xmax,ymax] -> reshape to xyxy
        pts = np.sort(rng.uniform(8, IMG - 8, (3, 2, 2)), axis=1)
        targets.append({
            "boxes": pts.reshape(3, 4).astype(np.float32),
            "classes": rng.integers(0, NC, (3,)),
        })
    map_j = compute_map50_95(preds_j, targets)["map50_95"]
    map_t = compute_map50_95(preds_t, targets)["map50_95"]
    assert abs(map_j - map_t) <= 0.02, f"mAP@50-95 {map_j} vs {map_t}"
