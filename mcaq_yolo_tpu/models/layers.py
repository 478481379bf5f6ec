"""
YOLOv8 building blocks in Flax linen, NHWC (TPU conv-native layout).

The reference delegates the entire network to Ultralytics
(reference models/mcaq_yolo.py:9-11); these are from-scratch JAX modules
with YOLOv8's architecture semantics: Conv+BN+SiLU, C2f (split + residual
bottleneck stack + concat), SPPF (stacked 5x5 max pools).

BatchNorm follows YOLOv8's hyperparameters (eps 1e-3, torch momentum 0.03
== flax momentum 0.97) via the 'batch_stats' collection.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

BN_MOMENTUM = 0.97  # flax convention: running = m * running + (1-m) * batch
BN_EPS = 1e-3


class ConvBnSiLU(nn.Module):
    """Conv2D + BatchNorm + SiLU — YOLOv8's 'Conv' block.

    Padding is the explicit symmetric (k//2, k//2) that torch's autopad
    (Ultralytics Conv, `autopad(k) = k // 2`) uses — NOT XLA 'SAME', which
    for stride-2 k=3 on even inputs pads (0, 1) and would shift every
    downsample feature map by one pixel relative to converted torch weights.
    Output shapes are identical for the k/stride combos YOLOv8 uses.

    `dtype` is the compute dtype (bfloat16 on TPU for MXU throughput);
    parameters and BN statistics stay float32 (`param_dtype`)."""

    features: int
    kernel: int = 1
    stride: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not training,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.act:
            x = nn.silu(x)
        return x


class Bottleneck(nn.Module):
    """Two 3x3 convs with an optional residual add."""

    features: int
    shortcut: bool = True
    expansion: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        hidden = int(self.features * self.expansion)
        y = ConvBnSiLU(hidden, 3, dtype=self.dtype)(x, training)
        y = ConvBnSiLU(self.features, 3, dtype=self.dtype)(y, training)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C2f(nn.Module):
    """CSP bottleneck with 2 convolutions, 'fast' variant.

    cv1 projects to 2*hidden and splits; n bottlenecks each append a branch;
    cv2 fuses the concatenation.  The growing concat is a single fused copy
    under XLA (no intermediate materialization)."""

    features: int
    n: int = 1
    shortcut: bool = False
    expansion: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        hidden = int(self.features * self.expansion)
        y = ConvBnSiLU(2 * hidden, 1, dtype=self.dtype)(x, training)
        parts = [y[..., :hidden], y[..., hidden:]]
        for _ in range(self.n):
            parts.append(
                Bottleneck(hidden, self.shortcut, 1.0, dtype=self.dtype)(parts[-1], training)
            )
        return ConvBnSiLU(self.features, 1, dtype=self.dtype)(
            jnp.concatenate(parts, axis=-1), training)


class SPPF(nn.Module):
    """Spatial Pyramid Pooling - Fast: three stacked k x k max pools."""

    features: int
    pool_size: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        hidden = x.shape[-1] // 2
        y = ConvBnSiLU(hidden, 1, dtype=self.dtype)(x, training)

        k = self.pool_size
        pad = k // 2

        def pool(t):
            return lax.reduce_window(
                t, -jnp.inf, lax.max,
                (1, k, k, 1), (1, 1, 1, 1),
                ((0, 0), (pad, pad), (pad, pad), (0, 0)),
            )

        p1 = pool(y)
        p2 = pool(p1)
        p3 = pool(p2)
        return ConvBnSiLU(self.features, 1, dtype=self.dtype)(
            jnp.concatenate([y, p1, p2, p3], axis=-1), training
        )


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x upsample of NHWC — pure repeat, fused by XLA."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
