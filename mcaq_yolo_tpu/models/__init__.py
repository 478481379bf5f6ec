"""YOLOv8 model family + MCAQ assembly + detection loss (all native —
the reference imports the detection stack from Ultralytics; there is no
Ultralytics for JAX, so backbone/neck/head/loss/NMS are first-class
components here)."""

from .layers import ConvBnSiLU, C2f, SPPF, Bottleneck  # noqa: F401
from .yolo import (  # noqa: F401
    YOLOv8Backbone,
    YOLOv8Neck,
    DetectHead,
    YOLOv8,
    VARIANTS,
)
from .mcaq_yolo import MCAQYOLO  # noqa: F401
from .losses import MCAQYOLOLoss, DetectionLoss, kd_logit_loss  # noqa: F401
