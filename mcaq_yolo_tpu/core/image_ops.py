"""
Pure-JAX image primitives used by the morphology metric pipeline.

All functions are shape-static, jit-friendly, and vectorized over the batch —
no per-image Python loops (the reference's per-image Otsu loop,
reference core/morphology.py:409-417, becomes a vmap over a fixed 256-bin
histogram here).  Single-channel maps use (B, H, W) layout; convolutions
temporarily add a trailing channel dim (NHWC, the TPU-native conv layout).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ---------------------------------------------------------------------------
# Padding / pooling
# ---------------------------------------------------------------------------


def replicate_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Edge-replicate pad the last two axes of (B, H, W)."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)), mode="edge")


def avg_pool(x: jnp.ndarray, k: int, stride: int | None = None) -> jnp.ndarray:
    """Average pool over the last two axes of (B, H, W)."""
    stride = stride or k
    s = lax.reduce_window(
        x, 0.0, lax.add, (1, k, k), (1, stride, stride), "VALID"
    )
    return s / float(k * k)


def max_pool(x: jnp.ndarray, k: int, stride: int | None = None, pad: int = 0) -> jnp.ndarray:
    """Max pool over the last two axes of (B, H, W)."""
    stride = stride or k
    padding = ((0, 0), (pad, pad), (pad, pad))
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k), (1, stride, stride), padding
    )


def dilate3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 binary dilation (max pool, stride 1, same size)."""
    return max_pool(x, 3, stride=1, pad=1)


def erode3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 binary erosion via -maxpool(-x)."""
    return -max_pool(-x, 3, stride=1, pad=1)


# ---------------------------------------------------------------------------
# Single-channel convolution helpers
# ---------------------------------------------------------------------------


def _conv_single(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """VALID conv of (B, H, W) with a (kh, kw) kernel -> (B, H-kh+1, W-kw+1).

    Uses NHWC/HWIO — the layout XLA maps directly onto the TPU conv units.
    """
    x4 = x[..., None].astype(jnp.float32)
    k4 = kernel[..., None, None].astype(jnp.float32)
    y = lax.conv_general_dilated(
        x4, k4, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y[..., 0]


def conv2d_replicate(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """SAME conv with edge-replicate padding (cv2's default border mode)."""
    kh, kw = kernel.shape
    xp = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)), mode="edge")
    return _conv_single(xp, kernel)


def conv2d_zero(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """SAME conv with zero padding."""
    kh, kw = kernel.shape
    xp = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)))
    return _conv_single(xp, kernel)


def gaussian_kernel1d(k: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(k, dtype=jnp.float32) - k // 2
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / g.sum()


def gaussian_blur(x: jnp.ndarray, k: int, sigma: float, mode: str = "zero") -> jnp.ndarray:
    """Separable Gaussian blur of (B, H, W)."""
    g1 = gaussian_kernel1d(k, sigma)
    g2 = g1[:, None] * g1[None, :]
    if mode == "edge":
        return conv2d_replicate(x, g2)
    return conv2d_zero(x, g2)


# numpy, NOT jnp: a module-level jnp.array would initialize the jax
# backend at import time — on a host whose TPU tunnel endpoint is down,
# backend init HANGS (no deadline), so importing the package would hang
# (the __init__ probe thread would poison the global backend lock).
# jnp converts these on first use inside a traced context.
_SOBEL_X = np.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]],
                    np.float32)
_SOBEL_Y = np.array([[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]],
                    np.float32)


def sobel(gray: jnp.ndarray, mode: str = "zero"):
    """3x3 Sobel gradients of (B, H, W).  mode 'zero' matches the reference
    surrogate's torch F.conv2d padding=1 (reference morphology.py:386-395);
    mode 'edge' approximates cv2.Sobel's reflect101 border (used by the
    per-tile metric mode where borders occur at every tile)."""
    conv = conv2d_replicate if mode == "edge" else conv2d_zero
    # plain asarray (f32), matching the previous jnp.array constants'
    # promotion behavior exactly
    return conv(gray, jnp.asarray(_SOBEL_X)), conv(gray, jnp.asarray(_SOBEL_Y))


# ---------------------------------------------------------------------------
# Normalization / histograms / Otsu
# ---------------------------------------------------------------------------


def normalize01(x: jnp.ndarray) -> jnp.ndarray:
    """Per-image min-max normalization of (B, H, W) to [0, 1]."""
    x_min = jnp.min(x, axis=(1, 2), keepdims=True)
    x_max = jnp.max(x, axis=(1, 2), keepdims=True)
    return (x - x_min) / (x_max - x_min + 1e-8)


def histogram01(x: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Per-image histogram of (B, N) values in [0, 1] -> (B, bins).

    Scatter-add formulation: O(N) per image, vectorized over the batch —
    replaces the reference's per-image torch.histc loop."""
    idx = jnp.clip((x * bins).astype(jnp.int32), 0, bins - 1)

    def one(i):
        return jnp.zeros((bins,), jnp.float32).at[i].add(1.0)

    return jax.vmap(one)(idx)


def otsu_threshold(x: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Per-image Otsu threshold of (B, H, W) in [0, 1] -> (B, 1, 1).

    Same bin-center math as the reference GPU surrogate
    (reference morphology.py:397-418): maximize the between-class variance
    sigma_b = (mu_T * omega - mu)^2 / (omega (1 - omega))."""
    B = x.shape[0]
    hist = histogram01(x.reshape(B, -1), bins)  # (B, bins)
    centers = (jnp.arange(bins, dtype=jnp.float32) + 0.5) / bins
    p = hist / jnp.clip(hist.sum(axis=1, keepdims=True), 1.0, None)
    omega = jnp.cumsum(p, axis=1)
    mu = jnp.cumsum(p * centers[None, :], axis=1)
    mu_t = mu[:, -1:]
    sigma_b = (mu_t * omega - mu) ** 2 / (omega * (1.0 - omega) + 1e-12)
    thr = centers[jnp.argmax(sigma_b, axis=1)]
    return thr.reshape(B, 1, 1)


# ---------------------------------------------------------------------------
# Upsampling
# ---------------------------------------------------------------------------


def upsample_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor upsample of (B, Ht, Wt) or (B, Ht, Wt, C) to (H, W).

    For exact tile multiples this is a pure repeat (no gather), which XLA
    fuses into consumers; otherwise falls back to index gathering with
    torch.nn.functional.interpolate(mode='nearest') index semantics
    (floor(i * in/out))."""
    H, W = size
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    B, Ht, Wt, C = x.shape
    if H % Ht == 0 and W % Wt == 0:
        y = jnp.repeat(jnp.repeat(x, H // Ht, axis=1), W // Wt, axis=2)
    else:
        ri = (jnp.arange(H) * Ht // H).astype(jnp.int32)
        ci = (jnp.arange(W) * Wt // W).astype(jnp.int32)
        y = x[:, ri][:, :, ci]
    return y[..., 0] if squeeze else y


# ---------------------------------------------------------------------------
# Tile geometry (reference morphology.py:359-376)
# ---------------------------------------------------------------------------


def tile_size_for(H: int, grid_size: int) -> int:
    """Largest power of two <= max(4, H // grid_size).

    Power-of-two tiles make the dyadic box-counting scales divide the tile
    exactly; the floor of 4 guarantees >= 2 dyadic scales for the fractal
    regression.  Documented deviation from the paper's literal 8x8 grid is
    inherited from the reference (640 -> tile 64 -> 10x10 grid)."""
    raw = max(4, H // grid_size)
    tile = 1 << (raw.bit_length() - 1)
    if tile > H:  # robustness beyond the reference: tiny maps (H < 4) get a
        tile = max(1, 1 << (H.bit_length() - 1))  # single degenerate tile
    return tile
