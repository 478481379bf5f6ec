"""
Morphological Complexity Analysis — TPU-native JAX implementation.

Re-implements the reference's vectorized metric surrogate pipeline
(reference core/morphology.py) as pure, jit-compatible JAX: five tile-wise
metrics phi1..phi5 plus three interaction terms fused by a small learnable
MLP and bilaterally filtered into a per-tile complexity map C in [0, 1].

Design differences from the reference (TPU-first, not a translation):
  * Everything is batched/vectorized — the per-image Otsu histogram loop
    (reference morphology.py:409-417) becomes a scatter-add histogram vmapped
    over the batch; the data-dependent control flow is gone.
  * phi computation is wrapped in lax.stop_gradient (the paper's "deterministic
    side-information"); gradients flow only through the complexity MLP.
  * Layout is NHWC (TPU conv-native); the channel mean reduces the feature
    map to a (B, H, W) gray image.
  * The exact OpenCV backend (offline dataset scoring / backend-agreement
    reference) lives in `morphology_cv2.py` — same split as the reference's
    metric_backend='cv2' vs 'gpu' dispatch (reference morphology.py:798-824).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from . import image_ops as iops

# ---------------------------------------------------------------------------
# Tensorized Canny (cv2compat default + legacy variant)
# ---------------------------------------------------------------------------


def _canny_nms(mag: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    """Non-maximum suppression along 4 quantized gradient directions
    (reference morphology.py:426-449).  mag/gx/gy: (B, H, W)."""
    angle = jnp.arctan2(gy, gx) * (180.0 / math.pi)
    angle = jnp.where(angle < 0, angle + 180.0, angle)

    H, W = mag.shape[-2:]
    padded = iops.replicate_pad(mag, 2)

    def shift(dy, dx):
        return lax.dynamic_slice(
            padded, (0, 2 + dy, 2 + dx), (mag.shape[0], H, W)
        )

    bins = [
        ((angle < 22.5) | (angle >= 157.5), (0, 1), (0, -1)),
        ((angle >= 22.5) & (angle < 67.5), (-1, 1), (1, -1)),
        ((angle >= 67.5) & (angle < 112.5), (-1, 0), (1, 0)),
        ((angle >= 112.5) & (angle < 157.5), (-1, -1), (1, 1)),
    ]
    nms = jnp.zeros_like(mag)
    for sel, (dy1, dx1), (dy2, dx2) in bins:
        keep = (mag >= shift(dy1, dx1)) & (mag >= shift(dy2, dx2))
        nms = jnp.where(sel & keep, mag, nms)
    return nms


def canny_cv2compat(gray: jnp.ndarray, hysteresis_iters: int = 8,
                    pad_mode: str = "zero") -> jnp.ndarray:
    """Tensorized Canny replicating cv2's operator semantics
    (reference morphology.py:457-509): 0..255 intensity domain, 5x5 Gaussian
    blur sigma=1, Otsu on the blurred intensity, L1 gradient magnitude,
    4-direction NMS, double threshold (high=Otsu, low=0.5*Otsu), fixed-count
    dilation-pass hysteresis.  gray: (B, H, W) in [0, 1] -> {0,1} float map.

    pad_mode 'edge' approximates cv2's reflect101 borders — used by the
    per-tile metric mode, where every tile boundary is a border."""
    b01 = iops.gaussian_blur(gray, 5, 1.0, mode=pad_mode)
    b255 = b01 * 255.0

    thr255 = iops.otsu_threshold(b01) * 255.0  # (B,1,1)

    gx, gy = iops.sobel(b255, mode=pad_mode)
    mag = jnp.abs(gx) + jnp.abs(gy)  # L1 (cv2.Canny default L2gradient=False)

    nms = _canny_nms(mag, gx, gy)
    strong = (nms > thr255).astype(jnp.float32)
    weak = (nms > 0.5 * thr255).astype(jnp.float32)

    # Hysteresis: static unrolled dilation passes (compiler-friendly — no
    # data-dependent convergence loop).
    edge = strong
    for _ in range(max(1, hysteresis_iters)):
        grown = iops.dilate3(edge)
        edge = jnp.where((weak > 0) & (grown > 0), 1.0, edge)
    return edge


def canny_legacy(gray: jnp.ndarray) -> jnp.ndarray:
    """Legacy surrogate (reference morphology.py:511-540): Otsu on the
    normalized NMS gradient magnitude, L2 magnitude, 2 hysteresis passes.
    Kept for the backend-agreement script's --legacy arm."""
    blurred = iops.gaussian_blur(gray, 5, 1.0, mode="zero")
    gx, gy = iops.sobel(blurred)
    mag = jnp.sqrt(gx**2 + gy**2 + 1e-12)
    nms = _canny_nms(mag, gx, gy)

    nms_n = iops.normalize01(nms)
    thr = iops.otsu_threshold(nms_n)
    strong = (nms_n > thr).astype(jnp.float32)
    weak = (nms_n > 0.5 * thr).astype(jnp.float32)

    edge = strong
    for _ in range(2):
        grown = iops.dilate3(edge)
        edge = jnp.where((weak > 0) & (grown > 0), 1.0, edge)
    return edge


# ---------------------------------------------------------------------------
# Binarization for phi5
# ---------------------------------------------------------------------------


def adaptive_binarize(gray: jnp.ndarray, block: int = 11, C: float = 2.0) -> jnp.ndarray:
    """Tensor replica of cv2.adaptiveThreshold(GAUSSIAN, BINARY, 11, 2)
    (reference morphology.py:550-573): dst = 1 iff src > G11(src) - C in
    0..255 units, Gaussian sigma = 0.3*((k-1)*0.5 - 1) + 0.8, replicate pad."""
    g255 = gray * 255.0
    sigma = 0.3 * ((block - 1) * 0.5 - 1) + 0.8
    local_mean = iops.gaussian_blur(g255, block, sigma, mode="edge")
    return (g255 > local_mean - C).astype(jnp.float32)


def otsu_binarize(gray: jnp.ndarray) -> jnp.ndarray:
    """Legacy global Otsu binarization."""
    thr = iops.otsu_threshold(gray)
    return (gray > thr).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Tile-wise metric kernels (phi1..phi5)
# ---------------------------------------------------------------------------


def fractal_dimension_tiles(edge: jnp.ndarray, tile: int) -> jnp.ndarray:
    """phi1 core: box-counting fractal dimension per tile, vectorized across
    all tiles (reference morphology.py:575-621).  Dyadic scales 2..tile,
    weighted log-log least-squares slope, weights e^{-0.1 i}, Df in [1, 2].

    edge: (B, Hc, Wc) binary float; returns (B, ht, wt)."""
    B, Hc, Wc = edge.shape
    ht, wt = Hc // tile, Wc // tile

    scales = []
    s = 2
    while s <= tile:
        scales.append(s)
        s *= 2
    if len(scales) < 2:
        return jnp.ones((B, ht, wt), jnp.float32)

    counts = []
    for s in scales:
        pooled = iops.max_pool(edge, s)  # box occupancy at scale s
        k = tile // s
        n_s = iops.avg_pool(pooled, k) * float(k * k)  # occupied boxes per tile
        counts.append(n_s)

    n = jnp.stack(counts, axis=0)  # (S, B, ht, wt)
    S = len(scales)
    x = jnp.log(jnp.array(scales, jnp.float32)).reshape(S, 1, 1, 1)
    y = jnp.log(n + 1.0)
    w = jnp.exp(-0.1 * jnp.arange(S, dtype=jnp.float32)).reshape(S, 1, 1, 1)

    w_sum = w.sum(axis=0)
    x_mean = (w * x).sum(axis=0) / w_sum
    y_mean = (w * y).sum(axis=0) / w_sum
    cov = (w * (x - x_mean) * (y - y_mean)).sum(axis=0)
    var = (w * (x - x_mean) ** 2).sum(axis=0)
    df = -(cov / (var + 1e-12))
    return jnp.clip(df, 1.0, 2.0)


def lbp_entropy_tiles(gray: jnp.ndarray, tile: int) -> jnp.ndarray:
    """phi2: uniform-LBP histogram entropy per tile (reference
    morphology.py:623-652).  P=8, R=1; uniform patterns labeled by #ones
    (0..8), non-uniform -> 9; entropy over the 10-bin per-tile histogram
    normalized by log2(10).  gray: (B, Hc, Wc) -> (B, ht, wt)."""
    B, Hc, Wc = gray.shape
    gp = iops.replicate_pad(gray, 1)
    offsets = [(-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1)]
    bits = []
    for dy, dx in offsets:
        nb = lax.dynamic_slice(gp, (0, 1 + dy, 1 + dx), (B, Hc, Wc))
        bits.append((nb >= gray).astype(jnp.float32))
    bits_t = jnp.stack(bits, axis=-1)  # (B, Hc, Wc, 8)

    n_ones = bits_t.sum(axis=-1)
    trans = jnp.abs(bits_t - jnp.roll(bits_t, 1, axis=-1)).sum(axis=-1)
    label = jnp.where(trans <= 2.0, n_ones, 9.0).astype(jnp.int32)  # 0..9

    onehot = jax.nn.one_hot(label, 10, dtype=jnp.float32)  # (B, Hc, Wc, 10)
    # per-tile histogram: average the one-hots over each tile
    p_tile = lax.reduce_window(
        onehot, 0.0, lax.add, (1, tile, tile, 1), (1, tile, tile, 1), "VALID"
    ) / float(tile * tile)
    ent = -(p_tile * jnp.log2(p_tile + 1e-10)).sum(axis=-1)
    return ent / math.log2(10.0)


def gradient_variance_tiles(gx: jnp.ndarray, gy: jnp.ndarray, tile: int) -> jnp.ndarray:
    """phi3: Eq.(22) (Var(Gx)+Var(Gy)) / (Var(Gx)+Var(Gy)+1) per tile
    (reference morphology.py:654-670)."""

    def tile_var(t):
        m = iops.avg_pool(t, tile)
        m2 = iops.avg_pool(t * t, tile)
        return jnp.clip(m2 - m * m, 0.0, None)

    v = tile_var(gx) + tile_var(gy)
    return v / (v + 1.0)


def euler_components_tiles(m: jnp.ndarray, tile: int,
                           all_windows: bool = False) -> jnp.ndarray:
    """Per-tile 8-connected component count K via Gray's quad-pattern Euler
    number, fully vectorized (reference morphology.py:672-707):
    E8 = (Q1 - Q3 - 2 QD) / 4 over all 2x2 windows of the zero-padded mask.
    m: (B, Hc, Wc) float {0,1} -> (B, ht, wt) with K >= 1.

    all_windows=True (per-tile metric mode, where each batch entry IS one
    zero-padded tile) sums ALL (t+1)^2 windows — the exact Euler number.
    The default replicates the reference surrogate's window->top-left-tile
    attribution, which drops the bottom/right window row/col and
    under-counts blobs touching that border (a documented reference
    residual, reference morphology.py:688-691); the per-tile mode has no
    reason to inherit that bias, and the exact count matches the cv2
    per-tile contour backend."""
    B, Hc, Wc = m.shape
    mp = jnp.pad(m, ((0, 0), (1, 1), (1, 1)))  # zero pad closes border blobs
    # 2x2 window pattern index: 1*tl + 2*tr + 4*bl + 8*br  -> 0..15
    tl = mp[:, :-1, :-1]
    tr = mp[:, :-1, 1:]
    bl = mp[:, 1:, :-1]
    br = mp[:, 1:, 1:]
    idx = (tl + 2.0 * tr + 4.0 * bl + 8.0 * br).astype(jnp.int32)  # (B, Hc+1, Wc+1)

    def count_in(vals):
        acc = jnp.zeros_like(idx, dtype=jnp.float32)
        for v in vals:
            acc = acc + (idx == v).astype(jnp.float32)
        return acc

    q1 = count_in([1, 2, 4, 8])
    q3 = count_in([7, 11, 13, 14])
    qd = count_in([6, 9])
    e = (q1 - q3 - 2.0 * qd) / 4.0  # per-window Euler contribution

    if all_windows:
        K = e.sum(axis=(1, 2))[:, None, None]  # exact: all (H+1)(W+1) windows
    else:
        ht, wt = Hc // tile, Wc // tile
        e = e[:, : ht * tile, : wt * tile]
        K = iops.avg_pool(e, tile) * float(tile * tile)
    return jnp.clip(jnp.round(K), 1.0, None)


def contour_complexity_tiles(
    binmask: jnp.ndarray, tile: int, contour_components: bool = True,
    euler_all_windows: bool = False,
) -> jnp.ndarray:
    """phi5: Eq.(24) mean inverse circularity per tile, Euler-K corrected
    (reference morphology.py:709-739).  boundary = mask - erode3(mask);
    ic = perim^2 / (4 pi area) / K; phi5 = 1 - 1/max(ic, 1); empty tiles 0."""
    m = binmask
    boundary = jnp.clip(m - iops.erode3(m), 0.0, None)

    area = iops.avg_pool(m, tile) * float(tile * tile)
    perim = iops.avg_pool(boundary, tile) * float(tile * tile)

    ic = (perim * perim) / (4.0 * math.pi * area + 1e-6)
    if contour_components:
        K = euler_components_tiles(m, tile, all_windows=euler_all_windows)
        ic = ic / K
    phi5 = 1.0 - 1.0 / jnp.clip(ic, 1.0, None)
    return jnp.where(area > 0, phi5, 0.0)


# ---------------------------------------------------------------------------
# Fused phi computation (Algorithm 1 lines 1-14)
# ---------------------------------------------------------------------------


def extract_tiles(gray: jnp.ndarray, tile: int):
    """(B, Hc, Wc) -> (B*ht*wt, tile, tile) — a pure reshape/transpose that
    turns the per-tile metric mode into plain batching over tiles."""
    B, Hc, Wc = gray.shape
    ht, wt = Hc // tile, Wc // tile
    t = gray.reshape(B, ht, tile, wt, tile)
    t = jnp.transpose(t, (0, 1, 3, 2, 4)).reshape(B * ht * wt, tile, tile)
    return t, ht, wt


def compute_phi_tiles(
    features: jnp.ndarray,
    grid_size: int = 8,
    canny_impl: str = "cv2compat",
    binarize_impl: str = "adaptive",
    contour_components: bool = True,
    metric_mode: str = "tiled",
    downsample: int = 1,
    tile_engine: str = "lanes",
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Compute the 8-D per-tile morphological descriptor vector.

    features: (B, H, W, C) NHWC feature map (or (B, H, W, 3) image).
    Returns (phi (B, ht, wt, 8), detailed dict of the 5 raw metrics).

    The entire pipeline runs under stop_gradient (deterministic
    side-information; reference morphology.py:798-824) and in float32 —
    the bf16 discipline keeps metric statistics full-precision even when
    the network runs bfloat16 (the TPU analogue of the reference's AMP
    guard, morphology.py:819-824).

    metric_mode:
      'tiled'  (default) — run every operator PER TILE (tile-local Otsu
        thresholds, tile-local borders), matching the exact cv2 backend's
        per-tile recipe (reference morphology.py:761-783).  Implemented as
        plain batching over a (B*ht*wt, tile, tile) reshape — a fidelity
        improvement over the reference's whole-image training surrogate,
        whose edge-density scale diverged from cv2 (their measured r~0.5
        pre-fix; whole-image Otsu vs per-tile Otsu is the dominant cause).
      'global' — the reference surrogate's whole-image semantics
        (reference morphology.py:826-873), kept for comparison/ablation.

    downsample (default 1 = reference-faithful): run the metric operators
      on a `downsample`x average-pooled gray map — an OPT-IN throughput
      lever (4x less metric arithmetic at 2x) for deployments where the
      morphology pipeline shows up in the profile.  The tile GRID is
      unchanged (tile size shrinks with the image), so phi shapes and the
      downstream bit-allocation contract are identical; per-tile values
      are a half-resolution estimate of the same statistics.  The factor
      auto-degrades per scale so tile_size/downsample stays >= 4 (the
      metric kernels' minimum support): at yolov8 geometry a 2x request
      applies at P3 and self-disables at P4/P5.
    """
    if jnp.issubdtype(features.dtype, jnp.integer):
        # uint8 images from the data pipeline: normalize in-graph (the
        # models do the same — the host ships integer batches)
        features = features.astype(jnp.float32) / 255.0
    B, H, W, C = features.shape
    tile = iops.tile_size_for(H, grid_size)
    ht, wt = H // tile, W // tile
    Hc, Wc = ht * tile, wt * tile

    feats = lax.stop_gradient(features.astype(jnp.float32))
    gray = feats[:, :Hc, :Wc, :].mean(axis=-1)  # (B, Hc, Wc)
    if downsample > 1:
        # per-scale auto-degrade: the metric kernels need tile >= 4, so a
        # 2x request applies at P3 (tile 8+) and self-disables at P4/P5
        # (tile 4) — which is where almost none of the pixels are anyway
        if downsample & (downsample - 1):
            raise ValueError(
                f"morph_downsample must be a power of two, got {downsample}"
                " — non-pow2 factors produce pool/tile sizes that don't"
                " divide the feature map and silently change the phi-map"
                " geometry")
        ds = downsample
        while ds > 1 and tile // ds < 4:
            ds //= 2
        if ds > 1:
            gray = iops.avg_pool(gray, ds)  # (B, Hc/ds, Wc/ds)
            tile //= ds
    gray = iops.normalize01(gray)  # per-image (mirrors the uint8 conversion)

    if metric_mode == "tiled" and tile_engine == "lanes":
        # tiles-in-lanes engine (morphology_lanes.py): identical operator
        # semantics, TPU-native layout — 128 tiles per vector lane row
        # instead of an 8-wide minor axis padded 16x, and a sort-based
        # per-tile Otsu instead of a (n_tiles, 256) scatter histogram
        from . import morphology_lanes as ml

        phi1, phi2, phi3, phi4, phi5 = ml.phi_metrics_tiled(
            gray, tile, canny_impl, binarize_impl, contour_components
        )
        phi1 = phi1 / 2.0
    elif metric_mode == "tiled":
        tiles, _, _ = extract_tiles(gray, tile)  # (B*ht*wt, tile, tile)
        gx, gy = iops.sobel(tiles, mode="edge")  # tile-local borders
        if canny_impl == "legacy":
            edge = canny_legacy(tiles)
        else:
            edge = canny_cv2compat(tiles, pad_mode="edge")
        binmask = (
            otsu_binarize(tiles) if binarize_impl == "otsu"
            else adaptive_binarize(tiles)
        )

        def per_tile(x):  # (B*ht*wt, 1, 1) -> (B, ht, wt)
            return x.reshape(B, ht, wt)

        phi1 = per_tile(fractal_dimension_tiles(edge, tile)) / 2.0
        phi2 = per_tile(lbp_entropy_tiles(tiles, tile))
        phi3 = per_tile(gradient_variance_tiles(gx, gy, tile))
        phi4 = per_tile(iops.avg_pool(edge, tile))
        phi5 = per_tile(
            contour_complexity_tiles(binmask, tile, contour_components,
                                     euler_all_windows=True)
        )
    else:
        gx, gy = iops.sobel(gray)  # plain Sobel for phi3 (Eq.22)

        if canny_impl == "legacy":
            edge = canny_legacy(gray)
        else:
            edge = canny_cv2compat(gray)

        if binarize_impl == "otsu":
            binmask = otsu_binarize(gray)
        else:
            binmask = adaptive_binarize(gray)

        phi1 = fractal_dimension_tiles(edge, tile) / 2.0  # Df/2 in [0.5, 1]
        phi2 = lbp_entropy_tiles(gray, tile)
        phi3 = gradient_variance_tiles(gx, gy, tile)
        phi4 = iops.avg_pool(edge, tile)  # Eq.(23) edge density
        phi5 = contour_complexity_tiles(binmask, tile, contour_components)

    # Algorithm 1 line 14: phi = [phi1..phi5, phi1*phi2, phi3^2, sqrt(phi4*phi5)]
    phi = jnp.stack(
        [phi1, phi2, phi3, phi4, phi5,
         phi1 * phi2, phi3**2, jnp.sqrt(phi4 * phi5 + 1e-12)],
        axis=-1,
    )  # (B, ht, wt, 8)

    detailed = {
        "fractal": phi1,
        "texture": phi2,
        "gradient": phi3,
        "edge": phi4,
        "contour": phi5,
    }
    return lax.stop_gradient(phi), jax.tree.map(lax.stop_gradient, detailed)


def score_image_eq8(
    images: jnp.ndarray,
    grid_size: int = 8,
    alpha: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Model-free Eq.(8) per-image complexity: C = sum_i alpha_i phi_i,
    tile-averaged (Algorithm 3 line 1; reference utils/dataset.py:276-401,
    morphology.py:923-937).

    Pure function of the image — `alpha=None` uses the paper's uniform
    initial weights (the analyzer buffer's init value), so the Trainer can
    score the dataset BEFORE any parameters exist and cache the result; the
    NNLS-refit alpha from `fit_feature_weights` can be passed later for the
    trained-ordering rescore.  Returns (B,) in [0, 1]."""
    phi, _ = compute_phi_tiles(images, grid_size=grid_size)
    if alpha is None:
        alpha = jnp.ones((5,), jnp.float32) / 5.0
    a = jnp.abs(jnp.asarray(alpha, jnp.float32))
    a = a / jnp.clip(a.sum(), 1e-8, None)
    c = (phi[..., :5] * a.reshape(1, 1, 1, 5)).sum(axis=-1)
    return jnp.clip(c.mean(axis=(1, 2)), 0.0, 1.0)


# ---------------------------------------------------------------------------
# Bilateral filter (Algorithm 1 line 18)
# ---------------------------------------------------------------------------


def bilateral_filter(
    c_map: jnp.ndarray,
    sigma_spatial: float = 2.0,
    sigma_range: float = 0.1,
    kernel_size: int = 5,
) -> jnp.ndarray:
    """Differentiable bilateral filter of a (B, ht, wt) complexity map
    (reference morphology.py:309-354).  The map is tile-resolution (tiny),
    so the k^2 shifted-window formulation is essentially free."""
    B, H, W = c_map.shape
    pad = kernel_size // 2
    xp = iops.replicate_pad(c_map, pad)

    patches = []
    spatial_w = []
    for dy in range(-pad, pad + 1):
        for dx in range(-pad, pad + 1):
            patches.append(
                lax.dynamic_slice(xp, (0, pad + dy, pad + dx), (B, H, W))
            )
            spatial_w.append(math.exp(-(dy * dy + dx * dx) / (2.0 * sigma_spatial**2)))
    patches = jnp.stack(patches, axis=-1)  # (B, H, W, k*k)
    sw = jnp.array(spatial_w, jnp.float32)  # (k*k,)

    range_w = jnp.exp(-((patches - c_map[..., None]) ** 2) / (2.0 * sigma_range**2))
    weights = sw * range_w
    filtered = (weights * patches).sum(axis=-1) / (weights.sum(axis=-1) + 1e-8)
    return filtered


# ---------------------------------------------------------------------------
# Complexity MLP + analyzer module
# ---------------------------------------------------------------------------


class ComplexityMLP(nn.Module):
    """8 -> 64 -> 32 -> 1 LayerNorm+ReLU MLP with sigmoid head
    (reference morphology.py:81-97).  LayerNorm (not BatchNorm) so per-tile
    statistics do not mix across the tile/image/scale batch; the final layer
    uses a wide xavier init (gain 3.0) so C does not collapse to ~0.5."""

    @nn.compact
    def __call__(self, phi: jnp.ndarray) -> jnp.ndarray:  # (..., 8) -> (..., 1)
        # epsilon 1e-5 matches torch.nn.LayerNorm's default (flax's is 1e-6)
        # so converted checkpoints and the parity harness agree numerically.
        x = nn.Dense(64)(phi)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        x = nn.relu(x)
        x = nn.Dense(32)(x)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        x = nn.relu(x)
        # xavier_uniform with gain g == variance_scaling(g^2, fan_avg, uniform)
        x = nn.Dense(
            1,
            kernel_init=nn.initializers.variance_scaling(9.0, "fan_avg", "uniform"),
            bias_init=nn.initializers.zeros,
        )(x)
        return nn.sigmoid(x)


class MorphologicalComplexityAnalyzer(nn.Module):
    """Hierarchical morphological complexity analyzer (Algorithm 1).

    __call__(features NHWC) -> complexity (B, ht, wt) in [0, 1]:
      phi (stop-grad side-info) -> ComplexityMLP (learnable) ->
      bilateral filter (sigma_s=2, sigma_r=0.1) -> clip.

    `feature_weights` is a non-learned buffer used only by the deterministic
    Eq.(8) dataset-scoring path (`score_image`); refit it post-training with
    `fit_feature_weights` (utils side, NNLS) — mirroring the reference's
    buffer + refit design (reference morphology.py:99-108, 875-921).
    """

    grid_size: int = 8
    canny_impl: str = "cv2compat"
    binarize_impl: str = "adaptive"
    contour_components: bool = True
    metric_mode: str = "tiled"  # 'tiled' (cv2-parity, default) | 'global'
    downsample: int = 1  # opt-in throughput lever (compute_phi_tiles doc)
    tile_engine: str = "lanes"  # 'lanes' (TPU-native layout) | 'rows'

    def setup(self):
        self.complexity_mlp = ComplexityMLP()
        self.feature_weights = self.variable(
            "buffers", "feature_weights", lambda: jnp.ones((5,), jnp.float32) / 5.0
        )

    def _phi(self, features):
        return compute_phi_tiles(
            features,
            grid_size=self.grid_size,
            canny_impl=self.canny_impl,
            binarize_impl=self.binarize_impl,
            contour_components=self.contour_components,
            metric_mode=self.metric_mode,
            downsample=self.downsample,
            tile_engine=self.tile_engine,
        )

    def __call__(self, features: jnp.ndarray, return_detailed: bool = False):
        phi, detailed = self._phi(features)
        B, ht, wt, _ = phi.shape

        c = self.complexity_mlp(phi.reshape(-1, 8)).reshape(B, ht, wt)
        c = bilateral_filter(c)
        c = jnp.clip(c, 0.0, 1.0)

        if return_detailed:
            return c, detailed
        return c

    def score_image(self, features: jnp.ndarray) -> jnp.ndarray:
        """Deterministic Eq.(8) per-image complexity for dataset sorting
        (Algorithm 3 line 1): C = sum_i alpha_i phi_i, tile-averaged.
        Returns (B,) in [0, 1]."""
        phi, _ = self._phi(features)
        alpha = jnp.abs(self.feature_weights.value)
        alpha = alpha / jnp.clip(alpha.sum(), 1e-8, None)
        c = (phi[..., :5] * alpha.reshape(1, 1, 1, 5)).sum(axis=-1)
        return jnp.clip(c.mean(axis=(1, 2)), 0.0, 1.0)
