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
tnn = torch.nn


class _TConv(tnn.Module):
    """Ultralytics Conv: Conv2d(bias=False, pad=k//2) + BN(1e-3, 0.03) + SiLU."""

    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = tnn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class _TBottleneck(tnn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = _TConv(c, c, 3)
        self.cv2 = _TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class _TC2f(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = _TConv(c1, 2 * self.c, 1)
        self.cv2 = _TConv((2 + n) * self.c, c2, 1)
        self.m = tnn.ModuleList(_TBottleneck(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class _TSPPF(tnn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = _TConv(c1, c_, 1)
        self.cv2 = _TConv(c_ * 4, c2, 1)
        self.m = tnn.MaxPool2d(5, 1, 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class _TDetect(tnn.Module):
    """Legacy (yolov8) Detect: plain Conv-Conv-Conv2d branches; raw maps."""

    def __init__(self, nc, ch, reg_max=16):
        super().__init__()
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = tnn.ModuleList(
            tnn.Sequential(_TConv(x, c2, 3), _TConv(c2, c2, 3),
                           tnn.Conv2d(c2, 4 * reg_max, 1)) for x in ch)
        self.cv3 = tnn.ModuleList(
            tnn.Sequential(_TConv(x, c3, 3), _TConv(c3, c3, 3),
                           tnn.Conv2d(c3, nc, 1)) for x in ch)
        # dfl.conv: fixed arange expectation kernel — present in real
        # state_dicts; the converter must tolerate (ignore) it
        self.dfl_conv = tnn.Conv2d(reg_max, 1, 1, bias=False)
        self.dfl_conv.weight.data = torch.arange(
            reg_max, dtype=torch.float32).view(1, reg_max, 1, 1)

    def forward(self, feats):
        return [torch.cat((self.cv2[i](f), self.cv3[i](f)), 1)
                for i, f in enumerate(feats)]


class _TYOLOv8n(tnn.Module):
    """Ultralytics yolov8n DetectionModel topology with the real layer
    indices: state_dict keys come out as model.{i}.*."""

    def __init__(self, nc=4):
        super().__init__()
        ch = [16, 32, 64, 128, 256]  # yolov8n widths (w=0.25)
        self.model = tnn.ModuleList([
            _TConv(3, ch[0], 3, 2),            # 0
            _TConv(ch[0], ch[1], 3, 2),        # 1
            _TC2f(ch[1], ch[1], 1, True),      # 2
            _TConv(ch[1], ch[2], 3, 2),        # 3
            _TC2f(ch[2], ch[2], 2, True),      # 4  -> C3
            _TConv(ch[2], ch[3], 3, 2),        # 5
            _TC2f(ch[3], ch[3], 2, True),      # 6  -> C4
            _TConv(ch[3], ch[4], 3, 2),        # 7
            _TC2f(ch[4], ch[4], 1, True),      # 8
            _TSPPF(ch[4], ch[4]),              # 9  -> C5
            tnn.Upsample(scale_factor=2, mode="nearest"),   # 10
            tnn.Identity(),                    # 11 (Concat)
            _TC2f(ch[4] + ch[3], ch[3], 1),    # 12
            tnn.Upsample(scale_factor=2, mode="nearest"),   # 13
            tnn.Identity(),                    # 14 (Concat)
            _TC2f(ch[3] + ch[2], ch[2], 1),    # 15 -> P3
            _TConv(ch[2], ch[2], 3, 2),        # 16
            tnn.Identity(),                    # 17 (Concat)
            _TC2f(ch[2] + ch[3], ch[3], 1),    # 18 -> P4
            _TConv(ch[3], ch[3], 3, 2),        # 19
            tnn.Identity(),                    # 20 (Concat)
            _TC2f(ch[3] + ch[4], ch[4], 1),    # 21 -> P5
            _TDetect(nc, (ch[2], ch[3], ch[4])),  # 22
        ])

    def forward(self, x):
        m = self.model
        x = m[1](m[0](x))
        x = m[2](x)
        c3 = m[4](m[3](x))
        c4 = m[6](m[5](c3))
        x = m[8](m[7](c4))
        c5 = m[9](x)
        p4 = m[12](torch.cat([m[10](c5), c4], 1))
        p3 = m[15](torch.cat([m[13](p4), c3], 1))
        n4 = m[18](torch.cat([m[16](p3), p4], 1))
        n5 = m[21](torch.cat([m[19](n4), c5], 1))
        return m[22]([p3, n4, n5])


def _randomize_bn_stats(module, gen):
    """Non-trivial BN running stats so eps/var handling errors surface."""
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(
                m.running_mean.shape, generator=gen) * 0.5)
            m.running_var.copy_(torch.rand(
                m.running_var.shape, generator=gen) * 1.5 + 0.5)
            m.weight.data.copy_(torch.rand(
                m.weight.shape, generator=gen) + 0.5)
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=gen) * 0.1)


def test_real_ultralytics_layout_forward_equivalence():
    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    tmodel = _TYOLOv8n(nc=4)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, gen)
    tmodel.eval()

    # real state_dict layout: model.{i}.*  (plus the dfl kernel, renamed to
    # the real Ultralytics key model.22.dfl.conv.weight)
    sd = {k.replace("model.22.dfl_conv.", "model.22.dfl.conv."): v
          for k, v in tmodel.state_dict().items()}
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
