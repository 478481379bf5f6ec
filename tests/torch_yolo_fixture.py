"""Genuine Ultralytics-topology torch YOLOv8n fixture (shared test helper).

Reproduces the real DetectionModel layout — exact state_dict key names
(model.{i}.*), exact forward semantics (autopad k//2, BN eps=1e-3 /
momentum=0.03, SiLU, C2f chunk ordering, SPPF 5x5 maxpool chain, legacy
Detect branches) — WITHOUT needing the ultralytics package.  Used by:

  * tests/test_weights_io.py — converter forward-output equivalence
  * tests/test_e2e_mcaq_parity.py — full MCAQ inference-path parity against
    the reference's PyTorch core (quantizer injected at C3/C4/C5, the
    reference's hook points, reference models/mcaq_yolo.py:459-473)
"""

from __future__ import annotations

import torch
import torch.nn as tnn


class TConv(tnn.Module):
    """Ultralytics Conv: Conv2d(bias=False, pad=k//2) + BN(1e-3, 0.03) + SiLU."""

    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = tnn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c, 3)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = tnn.ModuleList(TBottleneck(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(tnn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c_ * 4, c2, 1)
        self.m = tnn.MaxPool2d(5, 1, 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class TDetect(tnn.Module):
    """Legacy (yolov8) Detect: plain Conv-Conv-Conv2d branches; raw maps."""

    def __init__(self, nc, ch, reg_max=16):
        super().__init__()
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = tnn.ModuleList(
            tnn.Sequential(TConv(x, c2, 3), TConv(c2, c2, 3),
                           tnn.Conv2d(c2, 4 * reg_max, 1)) for x in ch)
        self.cv3 = tnn.ModuleList(
            tnn.Sequential(TConv(x, c3, 3), TConv(c3, c3, 3),
                           tnn.Conv2d(c3, nc, 1)) for x in ch)
        # dfl.conv: fixed arange expectation kernel — present in real
        # state_dicts; the converter must tolerate (ignore) it
        self.dfl_conv = tnn.Conv2d(reg_max, 1, 1, bias=False)
        self.dfl_conv.weight.data = torch.arange(
            reg_max, dtype=torch.float32).view(1, reg_max, 1, 1)

    def forward(self, feats):
        return [torch.cat((self.cv2[i](f), self.cv3[i](f)), 1)
                for i, f in enumerate(feats)]


# official scaling table (depth_mult, width_mult, max_channels) — must
# mirror mcaq_yolo_tpu.models.yolo.VARIANTS for the converter contract
T_VARIANTS = {
    "yolov8n": (0.33, 0.25, 1024),
    "yolov8s": (0.33, 0.50, 1024),
    "yolov8m": (0.67, 0.75, 768),
}


def _tch(base, w, mc):
    import math

    return int(math.ceil(min(base, mc) * w / 8) * 8)


def _tn(base, d):
    return max(round(base * d), 1)


class TYOLOv8n(tnn.Module):
    """Ultralytics yolov8 DetectionModel topology with the real layer
    indices: state_dict keys come out as model.{i}.*.  Variant-scaled
    (n/s/m) with the official depth/width/max-channel multiples — the same
    scaling rule as the flax model (models/yolo.py VARIANTS), so converter
    coverage is checked against the full official module tree per variant
    (VERDICT r3 item 5).

    forward(x, quant_fn=None): quant_fn(feat_nchw, scale_idx) -> feat_nchw
    is applied to the backbone outputs C3/C4/C5 before the neck — the exact
    injection points of the reference's MCAQ forward hooks
    (reference models/mcaq_yolo.py:459-473)."""

    def __init__(self, nc=4, variant="yolov8n"):
        super().__init__()
        d, w, mc = T_VARIANTS[variant]
        ch = [_tch(b, w, mc) for b in (64, 128, 256, 512, 1024)]
        n_short, n_long = _tn(3, d), _tn(6, d)  # backbone C2f repeats
        n_neck = _tn(3, d)                      # neck C2f repeats
        self.model = tnn.ModuleList([
            TConv(3, ch[0], 3, 2),             # 0
            TConv(ch[0], ch[1], 3, 2),         # 1
            TC2f(ch[1], ch[1], n_short, True),  # 2
            TConv(ch[1], ch[2], 3, 2),         # 3
            TC2f(ch[2], ch[2], n_long, True),  # 4  -> C3
            TConv(ch[2], ch[3], 3, 2),         # 5
            TC2f(ch[3], ch[3], n_long, True),  # 6  -> C4
            TConv(ch[3], ch[4], 3, 2),         # 7
            TC2f(ch[4], ch[4], n_short, True),  # 8
            TSPPF(ch[4], ch[4]),               # 9  -> C5
            tnn.Upsample(scale_factor=2, mode="nearest"),   # 10
            tnn.Identity(),                    # 11 (Concat)
            TC2f(ch[4] + ch[3], ch[3], n_neck),  # 12
            tnn.Upsample(scale_factor=2, mode="nearest"),   # 13
            tnn.Identity(),                    # 14 (Concat)
            TC2f(ch[3] + ch[2], ch[2], n_neck),  # 15 -> P3
            TConv(ch[2], ch[2], 3, 2),         # 16
            tnn.Identity(),                    # 17 (Concat)
            TC2f(ch[2] + ch[3], ch[3], n_neck),  # 18 -> P4
            TConv(ch[3], ch[3], 3, 2),         # 19
            tnn.Identity(),                    # 20 (Concat)
            TC2f(ch[3] + ch[4], ch[4], n_neck),  # 21 -> P5
            TDetect(nc, (ch[2], ch[3], ch[4])),  # 22
        ])

    def forward(self, x, quant_fn=None):
        m = self.model
        x = m[1](m[0](x))
        x = m[2](x)
        c3 = m[4](m[3](x))
        c4 = m[6](m[5](c3))
        x = m[8](m[7](c4))
        c5 = m[9](x)
        if quant_fn is not None:
            c3 = quant_fn(c3, 0)
            c4 = quant_fn(c4, 1)
            c5 = quant_fn(c5, 2)
        p4 = m[12](torch.cat([m[10](c5), c4], 1))
        p3 = m[15](torch.cat([m[13](p4), c3], 1))
        n4 = m[18](torch.cat([m[16](p3), p4], 1))
        n5 = m[21](torch.cat([m[19](n4), c5], 1))
        return m[22]([p3, n4, n5])

    def backbone_features(self, x):
        """(C3, C4, C5) NCHW — the tensors the MCAQ hooks see."""
        m = self.model
        x = m[1](m[0](x))
        x = m[2](x)
        c3 = m[4](m[3](x))
        c4 = m[6](m[5](c3))
        x = m[8](m[7](c4))
        return c3, c4, m[9](x)


def randomize_bn_stats(module, gen):
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


def ultralytics_state_dict(model: TYOLOv8n):
    """state_dict with the REAL Ultralytics key names (dfl kernel renamed)."""
    return {k.replace("model.22.dfl_conv.", "model.22.dfl.conv."): v
            for k, v in model.state_dict().items()}
