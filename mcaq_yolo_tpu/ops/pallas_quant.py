"""
Fused spatial-quantization Pallas TPU kernel.

TPU-native equivalent of the reference CUDA kernel
(reference ops/src/mcaq_kernel.cu): per pixel, look up the tile bit width,
quantize/dequantize with that bit width's per-channel scale/zero-point, and
(optionally) multiply by the Eq.19 soft mask — one fused VMEM pass, one HBM
read + one HBM write of the feature map.

Kernel design (deliberately different from the CUDA formulation):
  * The CUDA kernel gathers `bit_map[tile_idx]` and computes scale/zp per
    PIXEL (pow/div per element, mcaq_kernel.cu:48-79).  Gathers and
    per-element transcendentals are poison on the VPU; instead the
    per-(bit, channel) scale/zp table (7 x C — tiny) is precomputed OUTSIDE
    the kernel, the tile bit map is expanded to a pixel-resolution int32 map
    by XLA (a fused repeat, with the CUDA kernel's remainder-pixels-to-last-
    tile clamping), and the kernel statically loops over the 7 bit widths,
    mask-selecting each plane: 7 vectorized VPU passes over a VMEM block,
    zero gathers, zero division (reciprocals precomputed).
  * Grid is (B, row-blocks): each program handles a (block_h, W, C) slab in
    VMEM (block_h chosen so the slab fits comfortably), so the kernel
    streams the feature map at HBM speed-of-light.

A pure-jnp/XLA reference (`spatial_quantize_reference`) implements identical
math; the parity test (tests/test_pallas_quant.py) mirrors the reference's
CUDA-vs-PyTorch parity contract (reference tests/test_smoke.py:226-246).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.quantization import MAX_BITS, MIN_BITS, compute_scale_zeropoint

N_BITS = MAX_BITS - MIN_BITS + 1  # 7 planes (2..8 bits)


# ---------------------------------------------------------------------------
# Host-side preparation
# ---------------------------------------------------------------------------


def precompute_qparams(x_min: jnp.ndarray, x_max: jnp.ndarray):
    """Per-(bit, channel) quantization parameters.

    x_min/x_max: (C,) calibration range.  Returns (scale, inv_scale, zp),
    each (N_BITS, C) float32 — 7 x C is a few KB, computed once per call by
    XLA (the analogue of folding the per-pixel scale/zp math out of the
    CUDA kernel's hot loop)."""
    bits = jnp.arange(MIN_BITS, MAX_BITS + 1, dtype=jnp.float32).reshape(-1, 1)
    scale, zp = compute_scale_zeropoint(x_min[None, :], x_max[None, :], bits)
    return scale.astype(jnp.float32), (1.0 / scale).astype(jnp.float32), zp.astype(jnp.float32)


def expand_bit_indices(bit_map: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Tile bit map (B, Ht, Wt) -> pixel int32 index map (B, H, W) in 0..6.

    Remainder pixels map to the LAST tile (the CUDA kernel's clamping rule,
    mcaq_kernel.cu:48-53).  For exact tile multiples this lowers to a fused
    repeat."""
    B, Ht, Wt = bit_map.shape
    idx = jnp.clip(jnp.round(bit_map), MIN_BITS, MAX_BITS).astype(jnp.int32) - MIN_BITS
    th, tw = H // Ht, W // Wt
    if th * Ht == H and tw * Wt == W:
        return jnp.repeat(jnp.repeat(idx, th, axis=1), tw, axis=2)
    ri = jnp.minimum(jnp.arange(H) // max(th, 1), Ht - 1)
    ci = jnp.minimum(jnp.arange(W) // max(tw, 1), Wt - 1)
    return idx[:, ri][:, :, ci]


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _quant_body(x, bits4, min_ref, max_ref):
    """SINGLE-PASS per-pixel quantize/dequantize.

    The naive formulation runs 7 full quantize passes and mask-selects
    (what the XLA fallback does, and what this kernel's first version did).
    The bit width only enters through three PER-PIXEL SCALARS — qmin_b,
    qmax_b, and the level count d_b = qmax_b - qmin_b — so instead we build
    three (1, bh, W, 1) scalar maps with 7 cheap compare-selects (lane-1
    arrays, ~C x cheaper than feature-map passes) and run the quantize
    arithmetic ONCE over the (1, bh, W, C) block:

        inv_s = d_pix / range_c          (broadcast (.., 1) x (C,))
        zp    = clip(qmin_pix - x_min_c * inv_s, qmin_pix, qmax_pix)
        q     = clip(round(x * inv_s + zp), qmin_pix, qmax_pix)
        deq   = (q - zp) * range_c * (1/d)_pix

    ~10 VPU ops per element instead of ~7x6.  bits4 is (1, bh, W, 1) int32 —
    4-D already, so no boolean-vector reshapes (Mosaic cannot lower i1
    reshapes).

    Numerics note: reciprocal-multiply vs the reference path's division can
    flip round() at exact half-step boundaries; the parity contract vs the
    XLA reference is "mismatch fraction < 1%, every mismatch <= one
    quantization step" (the reference's own CUDA-vs-PyTorch tolerance class,
    reference tests/test_smoke.py:226-246)."""
    x_min = min_ref[0, :]  # (C,)
    x_max = max_ref[0, :]
    x_range = jnp.maximum(x_max - x_min, 1e-8)
    inv_range = 1.0 / x_range  # (C,)

    shape1 = bits4.shape
    qmin_pix = jnp.zeros(shape1, jnp.float32)
    d_pix = jnp.zeros(shape1, jnp.float32)
    inv_d_pix = jnp.zeros(shape1, jnp.float32)
    for b in range(N_BITS):
        qmin_b = -(2.0 ** (b + MIN_BITS - 1))
        qmax_b = 2.0 ** (b + MIN_BITS - 1) - 1.0
        sel = (bits4 == b).astype(jnp.float32)
        qmin_pix = qmin_pix + sel * qmin_b
        d_pix = d_pix + sel * (qmax_b - qmin_b)
        inv_d_pix = inv_d_pix + sel * (1.0 / (qmax_b - qmin_b))
    qmax_pix = qmin_pix + d_pix

    inv_s = d_pix * inv_range            # (1, bh, W, C)
    zp = jnp.clip(qmin_pix - x_min * inv_s, qmin_pix, qmax_pix)
    q = jnp.clip(jnp.round(x * inv_s + zp), qmin_pix, qmax_pix)
    return (q - zp) * (x_range * inv_d_pix)


def _quant_kernel(x_ref, bits_ref, min_ref, max_ref, out_ref):
    x = x_ref[...].astype(jnp.float32)  # (1, bh, W, C)
    out = _quant_body(x, bits_ref[...], min_ref, max_ref)
    out_ref[...] = out.astype(out_ref.dtype)


def _quant_kernel_masked(x_ref, bits_ref, min_ref, max_ref, mask_ref, out_ref):
    x = x_ref[...].astype(jnp.float32)
    out = _quant_body(x, bits_ref[...], min_ref, max_ref)
    out = out * mask_ref[...]  # Eq.(19) fused multiply, (1, bh, W, 1) f32
    out_ref[...] = out.astype(out_ref.dtype)


def _pick_block_h(H: int, W: int, C: int, budget_bytes: int = 384 << 10) -> int:
    """Rows per program, sized so the f32 slab stays ~384KB.

    Mosaic double-buffers every pipelined operand AND keeps the unrolled
    7-plane temporaries (q/deq/sel/out) on the vector stack, so the true
    VMEM footprint is ~10x the slab — a 384KB slab lands well inside the
    16MB scoped-vmem limit (a 1.6MB full-image slab OOMed at 18.75MB)."""
    rows = max(1, budget_bytes // max(1, W * C * 4))
    rows = min(rows, H)
    while H % rows:  # require exact division for a clean grid
        rows -= 1
    return max(1, rows)


@partial(jax.jit, static_argnames=("interpret",))
def spatial_quantize_pallas(
    x: jnp.ndarray,            # (B, H, W, C) NHWC
    bit_map: jnp.ndarray,      # (B, Ht, Wt) float (integers at eval)
    x_min: jnp.ndarray,        # (C,)
    x_max: jnp.ndarray,        # (C,)
    mask: Optional[jnp.ndarray] = None,  # (B, H, W) or (B, H, W, 1)
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused tile-wise quantize/dequantize (+ optional soft-mask multiply)."""
    B, H, W, C = x.shape
    x_min = jnp.broadcast_to(x_min.astype(jnp.float32).reshape(-1), (C,))
    x_max = jnp.broadcast_to(x_max.astype(jnp.float32).reshape(-1), (C,))
    bits_pix = expand_bit_indices(bit_map, H, W)[..., None]  # (B, H, W, 1)

    bh = _pick_block_h(H, W, C)
    grid = (B, H // bh)

    x_spec = pl.BlockSpec((1, bh, W, C), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    bits_spec = pl.BlockSpec((1, bh, W, 1), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec((1, C), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, bh, W, C), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)

    cost = pl.CostEstimate(
        flops=7 * B * H * W * C * 5,
        bytes_accessed=2 * B * H * W * C * 4 + B * H * W * 4,
        transcendentals=0,
    )

    if mask is not None:
        if mask.ndim == 3:
            mask = mask[..., None]  # (B, H, W, 1)
        mask_spec = pl.BlockSpec((1, bh, W, 1), lambda i, j: (i, j, 0, 0),
                                 memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _quant_kernel_masked,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=grid,
            in_specs=[x_spec, bits_spec, tbl_spec, tbl_spec, mask_spec],
            out_specs=out_spec,
            cost_estimate=cost,
            interpret=interpret,
        )(x, bits_pix, x_min.reshape(1, C), x_max.reshape(1, C),
          mask.astype(jnp.float32))

    return pl.pallas_call(
        _quant_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[x_spec, bits_spec, tbl_spec, tbl_spec],
        out_specs=out_spec,
        cost_estimate=cost,
        interpret=interpret,
    )(x, bits_pix, x_min.reshape(1, C), x_max.reshape(1, C))


# ---------------------------------------------------------------------------
# Pure-XLA reference (the parity contract's other arm)
# ---------------------------------------------------------------------------


def spatial_quantize_reference(
    x: jnp.ndarray,
    bit_map: jnp.ndarray,
    x_min: jnp.ndarray,
    x_max: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Identical math in plain jnp (static per-bit compose) — the fallback
    path and the ground truth the Pallas kernel is tested against."""
    B, H, W, C = x.shape
    xf = x.astype(jnp.float32)
    bits_pix = expand_bit_indices(bit_map, H, W)

    out = jnp.zeros_like(xf)
    for b in range(N_BITS):
        bit_width = b + MIN_BITS
        scale, zp = compute_scale_zeropoint(x_min, x_max, bit_width)
        qmin = -(2.0 ** (bit_width - 1))
        qmax = 2.0 ** (bit_width - 1) - 1.0
        q = jnp.clip(jnp.round(xf / scale + zp), qmin, qmax)
        deq = (q - zp) * scale
        out = jnp.where((bits_pix == b)[..., None], deq, out)
    if mask is not None:
        if mask.ndim == 3:
            mask = mask[..., None]
        out = out * mask.astype(jnp.float32)
    return out.astype(x.dtype)
