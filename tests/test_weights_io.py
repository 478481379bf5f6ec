"""Torch->JAX converter round-trip: build a torch-style state_dict with the
exact Ultralytics key layout from our own flax tree (inverse transforms),
convert it back, and check bit-exact recovery + overlay success."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcaq_yolo_tpu.models import YOLOv8
from mcaq_yolo_tpu.models.weights_io import (
    _BACKBONE_MAP,
    _NECK_MAP,
    HEAD_IDX,
    convert_torch_yolov8,
    load_pretrained_into,
)

# torch->JAX converter on full model trees - excluded from the CI fast gate
pytestmark = pytest.mark.slow


def _fake_torch_sd(variables):
    """Inverse of the converter: emit Ultralytics-style keys from the flax
    tree (random values already inside the tree)."""
    sd = {}
    p = variables["params"]
    s = variables["batch_stats"]

    def convbn(pp, ss, prefix):
        sd[f"{prefix}.conv.weight"] = np.transpose(
            np.asarray(pp["Conv_0"]["kernel"]), (3, 2, 0, 1)
        )
        sd[f"{prefix}.bn.weight"] = np.asarray(pp["BatchNorm_0"]["scale"])
        sd[f"{prefix}.bn.bias"] = np.asarray(pp["BatchNorm_0"]["bias"])
        sd[f"{prefix}.bn.running_mean"] = np.asarray(ss["BatchNorm_0"]["mean"])
        sd[f"{prefix}.bn.running_var"] = np.asarray(ss["BatchNorm_0"]["var"])

    def c2f(pp, ss, prefix):
        convbn(pp["ConvBnSiLU_0"], ss["ConvBnSiLU_0"], f"{prefix}.cv1")
        n = 0
        while f"Bottleneck_{n}" in pp:
            b = pp[f"Bottleneck_{n}"]
            bs = ss[f"Bottleneck_{n}"]
            convbn(b["ConvBnSiLU_0"], bs["ConvBnSiLU_0"], f"{prefix}.m.{n}.cv1")
            convbn(b["ConvBnSiLU_1"], bs["ConvBnSiLU_1"], f"{prefix}.m.{n}.cv2")
            n += 1
        convbn(pp["ConvBnSiLU_1"], ss["ConvBnSiLU_1"], f"{prefix}.cv2")

    for idx, name in _BACKBONE_MAP.items():
        node_p, node_s = p["backbone"][name], s["backbone"][name]
        if name.startswith("C2f"):
            c2f(node_p, node_s, str(idx))
        elif name.startswith("SPPF"):
            convbn(node_p["ConvBnSiLU_0"], node_s["ConvBnSiLU_0"], f"{idx}.cv1")
            convbn(node_p["ConvBnSiLU_1"], node_s["ConvBnSiLU_1"], f"{idx}.cv2")
        else:
            convbn(node_p, node_s, str(idx))

    for idx, name in _NECK_MAP.items():
        node_p, node_s = p["neck"][name], s["neck"][name]
        if name.startswith("C2f"):
            c2f(node_p, node_s, str(idx))
        else:
            convbn(node_p, node_s, str(idx))

    for i in range(3):
        hp, hs = p["head"], s["head"]
        convbn(hp[f"box{i}_conv0"], hs[f"box{i}_conv0"], f"{HEAD_IDX}.cv2.{i}.0")
        convbn(hp[f"box{i}_conv1"], hs[f"box{i}_conv1"], f"{HEAD_IDX}.cv2.{i}.1")
        sd[f"{HEAD_IDX}.cv2.{i}.2.weight"] = np.transpose(
            np.asarray(hp[f"box{i}_out"]["kernel"]), (3, 2, 0, 1)
        )
        sd[f"{HEAD_IDX}.cv2.{i}.2.bias"] = np.asarray(hp[f"box{i}_out"]["bias"])
        convbn(hp[f"cls{i}_conv0"], hs[f"cls{i}_conv0"], f"{HEAD_IDX}.cv3.{i}.0")
        convbn(hp[f"cls{i}_conv1"], hs[f"cls{i}_conv1"], f"{HEAD_IDX}.cv3.{i}.1")
        sd[f"{HEAD_IDX}.cv3.{i}.2.weight"] = np.transpose(
            np.asarray(hp[f"cls{i}_out"]["kernel"]), (3, 2, 0, 1)
        )
        sd[f"{HEAD_IDX}.cv3.{i}.2.bias"] = np.asarray(hp[f"cls{i}_out"]["bias"])
    return sd


def test_converter_roundtrip():
    model = YOLOv8(variant="yolov8n", num_classes=80)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32)
    )
    sd = _fake_torch_sd(variables)
    # prefix variants must both be handled
    sd_prefixed = {f"model.{k}": v for k, v in sd.items()}

    params, stats = convert_torch_yolov8(sd_prefixed)

    # overlay back onto the model and verify every converted leaf is exact
    new_vars = load_pretrained_into(variables, sd)

    def compare(a, b, path=""):
        if isinstance(a, dict):
            for k in a:
                compare(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=path
            )

    compare(params, {k: new_vars["params"][k] for k in ("backbone", "neck", "head")})
    compare(variables["params"], new_vars["params"])  # roundtrip is identity


def test_converter_shape_mismatch_detected():
    model = YOLOv8(variant="yolov8n", num_classes=80)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32)
    )
    sd = _fake_torch_sd(variables)
    sd["0.conv.weight"] = np.zeros((7, 3, 3, 3), np.float32)  # wrong O
    with pytest.raises(ValueError, match="shape mismatch"):
        load_pretrained_into(variables, sd)


# ---------------------------------------------------------------------------
# Real-layout numerical validation: a genuine Ultralytics-topology torch
# module (exact key names, exact forward semantics: autopad k//2, BN
# eps=1e-3/momentum=0.03, SiLU, C2f chunk ordering, SPPF 5x5 maxpool chain,
# legacy Detect branches) -> state_dict -> converter -> flax forward must
# match the torch forward.  This catches wrong conv transposes, BN eps,
# padding semantics, and head-branch conventions that the key-mapping
# round-trip above cannot (reference models/mcaq_yolo.py:243-250 loads real
# Ultralytics weights; this fixture reproduces that layout without needing
# the ultralytics package).
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")

from torch_yolo_fixture import (  # noqa: E402  (torch-gated import)
    TYOLOv8n,
    randomize_bn_stats,
    ultralytics_state_dict,
)


def test_key_manifest_matches_fixture_and_published_param_counts():
    """The vendored manifest (tests/yolov8_key_manifest.json) records the
    exact Ultralytics state_dict key names for n/s/m.  Two pins: (1) the
    fixture regenerates exactly those keys (drift guard), (2) the fixture's
    total parameter counts equal the PUBLISHED Ultralytics table exactly
    (3,157,200 / 11,166,560 / 25,902,640 at nc=80) — which fixes layer
    indices, widths, and bottleneck repeats (VERDICT r3 item 5)."""
    import json
    from pathlib import Path

    manifest = json.loads(
        (Path(__file__).parent / "yolov8_key_manifest.json").read_text())
    published = {"yolov8n": 3_157_200, "yolov8s": 11_166_560,
                 "yolov8m": 25_902_640}
    for variant, n_params in published.items():
        tmodel = TYOLOv8n(nc=80, variant=variant)
        assert sum(p.numel() for p in tmodel.parameters()) == n_params
        keys = sorted(ultralytics_state_dict(tmodel))
        assert keys == manifest[variant]["keys"], variant
        assert manifest[variant]["n_params"] == n_params


@pytest.mark.parametrize("variant", ["yolov8n", "yolov8s", "yolov8m"])
def test_strict_source_coverage(variant):
    """The converter must CONSUME every key of the full official module
    tree (beyond the documented ignorables: BN counters + the fixed DFL
    kernel) — strict=True raises otherwise, so a topology mismatch can
    never silently drop trained weights (VERDICT r3 item 5)."""
    tmodel = TYOLOv8n(nc=4, variant=variant)
    sd = ultralytics_state_dict(tmodel)
    assert any(k.endswith("num_batches_tracked") for k in sd)
    assert "model.22.dfl.conv.weight" in sd

    # strict conversion consumes the full manifest cleanly
    params, stats = convert_torch_yolov8(sd, strict=True)
    assert set(params) == {"backbone", "neck", "head"}

    # an extra (unmapped) source key must fail loudly under strict...
    sd_extra = dict(sd)
    sd_extra["model.23.conv.weight"] = np.zeros((8, 8, 1, 1), np.float32)
    with pytest.raises(ValueError, match="NOT consumed"):
        convert_torch_yolov8(sd_extra, strict=True)
    # ...and be skippable only on explicit opt-out
    convert_torch_yolov8(sd_extra, strict=False)


@pytest.mark.parametrize("variant", ["yolov8s", "yolov8m"])
def test_overlay_into_flax_template_s_m(variant):
    """Shape-level converter coverage for the larger variants: every
    converted leaf must land in the flax template with matching shapes
    (the n variant additionally gets forward-output equivalence below)."""
    tmodel = TYOLOv8n(nc=4, variant=variant)
    sd = ultralytics_state_dict(tmodel)
    model = YOLOv8(variant=variant, num_classes=4)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    new_vars = load_pretrained_into(variables, sd)
    # one spot leaf per section actually moved
    k0 = np.transpose(np.asarray(
        new_vars["params"]["backbone"]["ConvBnSiLU_0"]["Conv_0"]["kernel"]),
        (3, 2, 0, 1))
    np.testing.assert_array_equal(k0, sd["model.0.conv.weight"].numpy())


def test_real_ultralytics_layout_forward_equivalence():
    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    tmodel = TYOLOv8n(nc=4)
    with torch.no_grad():
        randomize_bn_stats(tmodel, gen)
    tmodel.eval()

    # real state_dict layout: model.{i}.*  (plus the dfl kernel, renamed to
    # the real Ultralytics key model.22.dfl.conv.weight)
    sd = ultralytics_state_dict(tmodel)
    assert "model.0.conv.weight" in sd and "model.22.cv2.0.0.conv.weight" in sd

    x = torch.randn(2, 3, 64, 64, generator=gen)
    with torch.no_grad():
        out_t = [o.numpy() for o in tmodel(x)]

    model = YOLOv8(variant="yolov8n", num_classes=4)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    new_vars = load_pretrained_into(variables, sd)

    x_nhwc = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    out_j = model.apply(new_vars, x_nhwc, training=False)

    assert len(out_j) == 3
    for i, (oj, ot) in enumerate(zip(out_j, out_t)):
        oj = np.transpose(np.asarray(oj), (0, 3, 1, 2))
        assert oj.shape == ot.shape, f"scale {i}: {oj.shape} vs {ot.shape}"
        np.testing.assert_allclose(
            oj, ot, atol=2e-4, rtol=2e-4,
            err_msg=f"scale {i} forward mismatch")
