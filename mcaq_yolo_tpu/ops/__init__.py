"""TPU kernels and fixed-shape detection ops: fused Pallas spatial
quantization (+ pure-XLA reference) and jit-compatible NMS."""

from .nms import batched_nms, non_max_suppression  # noqa: F401
