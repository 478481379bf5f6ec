"""Tiles-in-lanes metric engine for the per-tile morphology pipeline.

The row engine (`morphology.py` metric_mode='tiled') batches tiles as
(B*ht*wt, t, t): XLA lays the minor axis (t=8 at P3) across the 128-wide
vector lanes, so every elementwise/pool/conv op pads 8 -> 128 and wastes
~16x of both VPU throughput and effective bandwidth; the per-tile Otsu
additionally materializes a (B*ht*wt, 256) scatter histogram (~840 MB at
bs=128/640px).  Measured, the morphology stage costs 11.3 ms of a
33.4 ms yolov8n forward at bs=128 — the single largest non-conv stage.

This engine is the TPU-native layout fix (VERDICT r2 item 3): tiles are
packed into the LANE axis — (G, t, t, L=128 tiles) — so

  * every elementwise op runs 128 tiles per vector register row;
  * intra-tile convolutions become shift-and-add separable passes
    (Gaussian 5x5, Sobel 3x3) — pure fused elementwise work, no conv op,
    no layout change;
  * binary morphology (dilate/erode, hysteresis) becomes shift-max/min;
  * the per-tile Otsu becomes a SORT over the t*t pixel axis + prefix
    sums — bitwise-equal thresholds to the 256-bin histogram argmax
    (evaluated at value-run boundaries only, ties resolved to the first
    bin, exactly like jnp.argmax over the histogram), with no 256-bin
    scatter at all.

Semantics are IDENTICAL to the row engine (same operators, same padding
modes, same Otsu bin math — see test_morphology_lanes.py for the
equivalence suite); only the layout and op lowering differ.  The one
caveat shared by ALL conv lowerings (incl. the row engine across
backends): Canny NMS compares `mag >= shifted_mag`, so inputs with
exactly-symmetric gradients sit on ties that can flip single edge
pixels on last-ulp summation-order differences.  Reference
recipe being replicated per tile: reference core/morphology.py:457-509
(Canny), 550-573 (adaptive binarize), 575-739 (phi metrics).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

LANES = 128


# ---------------------------------------------------------------------------
# Layout: (N, t, t) <-> (G, t, t, L)
# ---------------------------------------------------------------------------


def pack_tiles(gray: jnp.ndarray, tile: int) -> Tuple[jnp.ndarray, int]:
    """(B, Hc, Wc) -> (G, t, t, L) with tiles packed into lanes.

    Returns (packed, n_tiles).  The pad tiles (zeros) are sliced away by
    `unpack_scalars`."""
    B, Hc, Wc = gray.shape
    ht, wt = Hc // tile, Wc // tile
    n = B * ht * wt
    t = gray.reshape(B, ht, tile, wt, tile)
    t = jnp.transpose(t, (0, 1, 3, 2, 4)).reshape(n, tile, tile)
    G = -(-n // LANES)
    t = jnp.pad(t, ((0, G * LANES - n), (0, 0), (0, 0)))
    t = t.reshape(G, LANES, tile, tile)
    return jnp.transpose(t, (0, 2, 3, 1)), n


def unpack_scalars(x: jnp.ndarray, n: int, B: int, ht: int, wt: int) -> jnp.ndarray:
    """Per-tile scalars (G, L) -> (B, ht, wt)."""
    return x.reshape(-1)[:n].reshape(B, ht, wt)


# ---------------------------------------------------------------------------
# Intra-tile shift machinery (axes 1=y, 2=x of (G, t, t, L))
# ---------------------------------------------------------------------------


def _shift(x: jnp.ndarray, dy: int, dx: int, mode: str) -> jnp.ndarray:
    """Shift the tile content by (dy, dx), padding tile borders.

    mode 'edge' replicates the border row/col (cv2 reflect101 approx, same
    choice as the row engine); 'zero' pads zeros (binary dilation); 'one'
    pads ones (binary EROSION — the row engine's -maxpool(-x) treats
    out-of-tile as -inf on the negated map, i.e. erosion ignores the
    border, and for {0,1} masks min-with-1 is exactly that)."""
    G, t, _, L = x.shape
    p = max(abs(dy), abs(dx))
    if p == 0:
        return x
    if mode == "edge":
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    else:
        cv = 1.0 if mode == "one" else 0.0
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)),
                     constant_values=cv)
    return lax.dynamic_slice(xp, (0, p + dy, p + dx, 0), x.shape)


def _sep_filter(x: jnp.ndarray, taps, mode: str) -> jnp.ndarray:
    """Separable filter: 1-D taps applied along y then x via shift-add."""
    k = len(taps)
    r = k // 2
    out = None
    for i, w in enumerate(taps):
        s = _shift(x, i - r, 0, mode) * w
        out = s if out is None else out + s
    res = None
    for i, w in enumerate(taps):
        s = _shift(out, 0, i - r, mode) * w
        res = s if res is None else res + s
    return res


def gaussian_blur5(x: jnp.ndarray, sigma: float = 1.0, mode: str = "edge") -> jnp.ndarray:
    g = jnp.exp(-(jnp.arange(5, dtype=jnp.float32) - 2) ** 2 / (2 * sigma**2))
    g = g / g.sum()
    return _sep_filter(x, [g[i] for i in range(5)], mode)


def gaussian_blur_k(x: jnp.ndarray, k: int, sigma: float, mode: str = "edge") -> jnp.ndarray:
    g = jnp.exp(-(jnp.arange(k, dtype=jnp.float32) - k // 2) ** 2 / (2 * sigma**2))
    g = g / g.sum()
    return _sep_filter(x, [g[i] for i in range(k)], mode)


def sobel(x: jnp.ndarray, mode: str = "edge"):
    """3x3 Sobel via separable passes: Gx = [1,2,1]_y * [-1,0,1]_x."""

    def pass1(v, taps, axis):
        out = None
        for i, w in enumerate(taps):
            s = (_shift(v, i - 1, 0, mode) if axis == 0
                 else _shift(v, 0, i - 1, mode)) * w
            out = s if out is None else out + s
        return out

    smooth_y = pass1(x, (1.0, 2.0, 1.0), 0)
    gx = pass1(smooth_y, (-1.0, 0.0, 1.0), 1)
    smooth_x = pass1(x, (1.0, 2.0, 1.0), 1)
    gy = pass1(smooth_x, (-1.0, 0.0, 1.0), 0)
    return gx, gy


def dilate3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 binary dilation: separable shift-max, zero border."""
    m = jnp.maximum(jnp.maximum(_shift(x, -1, 0, "zero"), x), _shift(x, 1, 0, "zero"))
    return jnp.maximum(jnp.maximum(_shift(m, 0, -1, "zero"), m), _shift(m, 0, 1, "zero"))


def erode3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 binary erosion: separable shift-min with pad-one borders (the
    row engine's -maxpool(-x) uses -inf init, so out-of-tile never wins
    the min — for {0,1} masks a padded 1 is the same no-op)."""
    m = jnp.minimum(jnp.minimum(_shift(x, -1, 0, "one"), x), _shift(x, 1, 0, "one"))
    return jnp.minimum(jnp.minimum(_shift(m, 0, -1, "one"), m), _shift(m, 0, 1, "one"))


# ---------------------------------------------------------------------------
# Per-tile reductions
# ---------------------------------------------------------------------------


def tile_sum(x: jnp.ndarray) -> jnp.ndarray:
    """(G, t, t, L) -> (G, L)."""
    return x.sum(axis=(1, 2))


def tile_mean(x: jnp.ndarray) -> jnp.ndarray:
    return x.mean(axis=(1, 2))


# ---------------------------------------------------------------------------
# Sort-based per-tile Otsu (bitwise-equal to the 256-bin histogram route)
# ---------------------------------------------------------------------------


def otsu_threshold(x: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Per-tile Otsu of (G, t, t, L) in [0,1] -> (G, 1, 1, L) threshold.

    Replicates `image_ops.otsu_threshold` exactly: quantize to bin indices,
    maximize sigma_b = (mu_T w - mu)^2 / (w (1-w)) over bins, thr = center
    of the argmax bin (first bin on ties).  Implemented as a SORT over the
    t*t pixel axis + prefix sums, evaluating sigma_b only at value-run
    boundaries (the last pixel of each bin run, where the pixel-cumulative
    w/mu equal the bin-cumulative ones); non-boundary positions are masked
    to -1 so they can never win.  Runs 128 tiles per vector row with no
    256-bin scatter."""
    G, t, _, L = x.shape
    n = t * t
    idx = jnp.clip((x * bins).astype(jnp.int32), 0, bins - 1)
    v = jnp.sort(idx.reshape(G, n, L), axis=1)  # ascending bins
    centers = (v.astype(jnp.float32) + 0.5) / bins

    p = 1.0 / n
    omega = (jnp.arange(1, n + 1, dtype=jnp.float32) * p).reshape(1, n, 1)
    mu = jnp.cumsum(centers * p, axis=1)
    mu_t = mu[:, -1:, :]
    sigma_b = (mu_t * omega - mu) ** 2 / (omega * (1.0 - omega) + 1e-12)

    # valid candidates: last pixel of each value run (incl. the last pixel)
    is_boundary = jnp.concatenate(
        [v[:, :-1, :] != v[:, 1:, :], jnp.ones((G, 1, L), bool)], axis=1
    )
    sigma_b = jnp.where(is_boundary, sigma_b, -1.0)
    # ties -> smallest bin: argmax picks the FIRST position, which within
    # equal sigma_b values is the smallest sorted bin, same as the
    # histogram argmax over bin index
    best = jnp.argmax(sigma_b, axis=1)  # (G, L)
    thr_bin = jnp.take_along_axis(v, best[:, None, :], axis=1)[:, 0, :]
    thr = (thr_bin.astype(jnp.float32) + 0.5) / bins
    return thr[:, None, None, :]


# ---------------------------------------------------------------------------
# Canny (cv2compat semantics, lanes layout)
# ---------------------------------------------------------------------------


def _canny_nms(mag, gx, gy):
    angle = jnp.arctan2(gy, gx) * (180.0 / math.pi)
    angle = jnp.where(angle < 0, angle + 180.0, angle)
    bins = [
        ((angle < 22.5) | (angle >= 157.5), (0, 1), (0, -1)),
        ((angle >= 22.5) & (angle < 67.5), (-1, 1), (1, -1)),
        ((angle >= 67.5) & (angle < 112.5), (-1, 0), (1, 0)),
        ((angle >= 112.5) & (angle < 157.5), (-1, -1), (1, 1)),
    ]
    nms = jnp.zeros_like(mag)
    for sel, (dy1, dx1), (dy2, dx2) in bins:
        keep = ((mag >= _shift(mag, dy1, dx1, "edge"))
                & (mag >= _shift(mag, dy2, dx2, "edge")))
        nms = jnp.where(sel & keep, mag, nms)
    return nms


def canny_cv2compat(tiles: jnp.ndarray, hysteresis_iters: int = 8) -> jnp.ndarray:
    """Row-engine `canny_cv2compat(..., pad_mode='edge')` in lanes layout."""
    b01 = gaussian_blur5(tiles, 1.0, mode="edge")
    b255 = b01 * 255.0
    thr255 = otsu_threshold(b01) * 255.0

    gx, gy = sobel(b255, mode="edge")
    mag = jnp.abs(gx) + jnp.abs(gy)
    nms = _canny_nms(mag, gx, gy)
    strong = (nms > thr255).astype(tiles.dtype)
    weak = (nms > 0.5 * thr255).astype(tiles.dtype)

    edge = strong
    for _ in range(max(1, hysteresis_iters)):
        grown = dilate3(edge)
        edge = jnp.where((weak > 0) & (grown > 0), 1.0, edge)
    return edge


def adaptive_binarize(tiles: jnp.ndarray, block: int = 11, C: float = 2.0) -> jnp.ndarray:
    g255 = tiles * 255.0
    sigma = 0.3 * ((block - 1) * 0.5 - 1) + 0.8
    local_mean = gaussian_blur_k(g255, block, sigma, mode="edge")
    return (g255 > local_mean - C).astype(tiles.dtype)


def otsu_binarize(tiles: jnp.ndarray) -> jnp.ndarray:
    thr = otsu_threshold(tiles)
    return (tiles > thr).astype(tiles.dtype)


# ---------------------------------------------------------------------------
# phi metrics (lanes layout; per-tile scalars out as (G, L))
# ---------------------------------------------------------------------------


def fractal_dimension(edge: jnp.ndarray, tile: int) -> jnp.ndarray:
    """phi1 core: dyadic box counting within each tile via shift-max
    coarsening (same scales/weights/regression as the row engine)."""
    G, t, _, L = edge.shape
    scales = []
    s = 2
    while s <= tile:
        scales.append(s)
        s *= 2
    if len(scales) < 2:
        return jnp.ones((G, L), jnp.float32)

    counts = []
    occ = edge
    cur = 1
    for s in scales:
        # coarsen occupancy by 2x from the previous level (dyadic)
        step = s // cur
        # max over the (step x step) block anchored at stride step
        m = occ
        d = 1
        while d < step:
            # shift +d pulls content from BELOW/RIGHT of the anchor, so the
            # stride-step anchor covers the block {y..y+step-1, x..x+step-1}
            m = jnp.maximum(m, _shift(m, d, 0, "zero"))
            m = jnp.maximum(m, _shift(m, 0, d, "zero"))
            d *= 2
        occ = m[:, ::step, ::step, :]  # (G, t/s, t/s, L) occupancy
        cur = s
        counts.append(occ.sum(axis=(1, 2)))  # occupied boxes per tile (G, L)

    n = jnp.stack(counts, axis=0)  # (S, G, L)
    S = len(scales)
    x = jnp.log(jnp.array(scales, jnp.float32)).reshape(S, 1, 1)
    y = jnp.log(n + 1.0)
    w = jnp.exp(-0.1 * jnp.arange(S, dtype=jnp.float32)).reshape(S, 1, 1)
    w_sum = w.sum(axis=0)
    x_mean = (w * x).sum(axis=0) / w_sum
    y_mean = (w * y).sum(axis=0) / w_sum
    cov = (w * (x - x_mean) * (y - y_mean)).sum(axis=0)
    var = (w * (x - x_mean) ** 2).sum(axis=0)
    return jnp.clip(-(cov / (var + 1e-12)), 1.0, 2.0)


def lbp_entropy(tiles: jnp.ndarray) -> jnp.ndarray:
    """phi2: uniform-LBP entropy per tile (P=8, R=1, 10 bins).  Neighbor
    reads replicate the tile border (row engine: replicate_pad)."""
    offsets = [(-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1)]
    bits = [( _shift(tiles, dy, dx, "edge") >= tiles) for dy, dx in offsets]
    n_ones = sum(b.astype(jnp.float32) for b in bits)
    trans = sum(
        jnp.abs(bits[i].astype(jnp.float32) - bits[i - 1].astype(jnp.float32))
        for i in range(8)
    )
    label = jnp.where(trans <= 2.0, n_ones, 9.0)  # (G, t, t, L), values 0..9

    n = tiles.shape[1] * tiles.shape[2]
    ent = jnp.zeros(label.shape[:1] + label.shape[3:], jnp.float32)  # (G, L)
    for v in range(10):
        p = (label == v).astype(jnp.float32).sum(axis=(1, 2)) / n
        ent = ent - p * jnp.log2(p + 1e-10)
    return ent / math.log2(10.0)


def gradient_variance(gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    """phi3: Eq.(22) per tile."""

    def var(t):
        m = tile_mean(t)
        m2 = tile_mean(t * t)
        return jnp.clip(m2 - m * m, 0.0, None)

    v = var(gx) + var(gy)
    return v / (v + 1.0)


def euler_components(m: jnp.ndarray) -> jnp.ndarray:
    """Per-tile 8-connected component count via Gray's quad Euler number.
    The row engine zero-pads the mask by 1 and scans all (t+1)^2 2x2
    windows; here the zero border comes from 'zero' shifts: window (i, j)
    of the padded mask has tl = m[i-1, j-1] etc., i.e. shifted reads with
    zero fill, evaluated at t*t + border positions.  We scan the same
    (t+1)x(t+1) window set by padding once."""
    G, t, _, L = m.shape
    mp = jnp.pad(m, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (G, t+2, t+2, L)
    tl = mp[:, :-1, :-1, :]
    tr = mp[:, :-1, 1:, :]
    bl = mp[:, 1:, :-1, :]
    br = mp[:, 1:, 1:, :]
    idx = (tl + 2.0 * tr + 4.0 * bl + 8.0 * br).astype(jnp.int32)  # (G, t+1, t+1, L)

    def count(vals):
        acc = jnp.zeros(idx.shape, jnp.float32)
        for v in vals:
            acc = acc + (idx == v).astype(jnp.float32)
        return acc.sum(axis=(1, 2))

    q1 = count([1, 2, 4, 8])
    q3 = count([7, 11, 13, 14])
    qd = count([6, 9])
    e = (q1 - q3 - 2.0 * qd) / 4.0
    return jnp.clip(jnp.round(e), 1.0, None)


def contour_complexity(binmask: jnp.ndarray, tile: int,
                       contour_components: bool = True) -> jnp.ndarray:
    """phi5: Eq.(24) per tile."""
    boundary = jnp.clip(binmask - erode3(binmask), 0.0, None)
    area = tile_sum(binmask)
    perim = tile_sum(boundary)
    ic = (perim * perim) / (4.0 * math.pi * area + 1e-6)
    if contour_components:
        ic = ic / euler_components(binmask)
    phi5 = 1.0 - 1.0 / jnp.clip(ic, 1.0, None)
    return jnp.where(area > 0, phi5, 0.0)


# ---------------------------------------------------------------------------
# Fused per-tile phi pipeline
# ---------------------------------------------------------------------------


def phi_metrics_tiled(gray: jnp.ndarray, tile: int, canny_impl: str,
                      binarize_impl: str, contour_components: bool):
    """Lanes-layout equivalent of the row engine's metric_mode='tiled'
    block (morphology.py compute_phi_tiles): gray (B, Hc, Wc) -> five
    (B, ht, wt) metric maps."""
    B, Hc, Wc = gray.shape
    ht, wt = Hc // tile, Wc // tile
    packed, n = pack_tiles(gray, tile)

    gx, gy = sobel(packed, mode="edge")
    if canny_impl == "legacy":
        # legacy variant: L2 magnitude, Otsu on normalized NMS, 2 passes
        b = gaussian_blur5(packed, 1.0, mode="zero")
        sgx, sgy = sobel(b, mode="zero")
        mag = jnp.sqrt(sgx**2 + sgy**2 + 1e-12)
        nms = _canny_nms(mag, sgx, sgy)
        mn = nms.min(axis=(1, 2), keepdims=True)
        mx = nms.max(axis=(1, 2), keepdims=True)
        nms_n = (nms - mn) / (mx - mn + 1e-8)
        thr = otsu_threshold(nms_n)
        strong = (nms_n > thr).astype(gray.dtype)
        weak = (nms_n > 0.5 * thr).astype(gray.dtype)
        edge = strong
        for _ in range(2):
            grown = dilate3(edge)
            edge = jnp.where((weak > 0) & (grown > 0), 1.0, edge)
    else:
        edge = canny_cv2compat(packed)
    binmask = (otsu_binarize(packed) if binarize_impl == "otsu"
               else adaptive_binarize(packed))

    def out(x):
        return unpack_scalars(x, n, B, ht, wt)

    phi1 = out(fractal_dimension(edge, tile))
    phi2 = out(lbp_entropy(packed))
    phi3 = out(gradient_variance(gx, gy))
    phi4 = out(tile_mean(edge))
    phi5 = out(contour_complexity(binmask, tile, contour_components))
    return phi1, phi2, phi3, phi4, phi5
