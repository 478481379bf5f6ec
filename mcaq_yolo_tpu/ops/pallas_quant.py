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
    per-element transcendentals are poison on the VPU.
  * v1 of this kernel moved the 7-way bit dispatch INTO the kernel as a
    compare-select loop over (1, bh, W, 1) scalar maps.  Lane-width-1
    arrays waste 127/128 VPU lanes, so those "cheap" maps cost ~8x the
    actual quantize arithmetic (measured 1348us vs the XLA fallback's
    644us at yolov8n/640 — see BENCH_r01 / VERDICT round 1).
  * v2 hoisted the bit dispatch out as three (B, H, W, 1) f32 planes —
    but a block whose LANE dimension is 1 inflates its DMA and VMEM
    footprint ~128x (each (8,128) vreg tile carries one useful lane), so
    the planes cost more bandwidth than the feature map itself (measured
    2054us vs the XLA compose's 1126us at yolov8n-P3/640, bs=32).
  * v3 keeps the plane hoist but ships the planes as 3-D (B, H, W) arrays
    blocked (1, bh, W): lane dim = W, no inflation.  The kernel reshapes
    each plane to (1, bh, W, 1) ONCE per block — a tiny bh*W-element
    relayout — after which every use is a per-sublane scalar broadcast
    against the (1, bh, W, C) feature slab, which Mosaic lowers natively.
    The kernel body is a single ~14-op/element streaming pass: memory-
    bound, not lane-starved.  Extra HBM traffic: 12 bytes/pixel of planes
    vs 8*C bytes/pixel of feature I/O (~5% at C=64).
  * v4 (this version) was the decisive swing (VERDICT r2 item 4):
      - bf16 feature I/O: the kernel always computed in f32 IN-REGISTER
        and wrote x.dtype, but the CALLER up-cast to f32 first — on a
        bandwidth-bound op with a bf16 network that doubles both the read
        and the write.  core/quantization.py now passes the original
        dtype through.
      - C=64 lane packing: a (…, 64) array uses 64 of each vreg's 128
        lanes and its DMA hits the lane-padding wall (measured ~118 GB/s
        vs ~411 GB/s flat-stream on this chip).  When C == 64 and the
        tile width is even, adjacent pixel PAIRS always share a tile
        (tile widths are pow2 >= 2), so the feature map is viewed as
        (B, H, W/2, 128) — a FREE row-major reshape — the scalar planes
        are built at half width (every even column), and the min/max
        tables are tiled to 128 lanes.  The soft mask IS pixel-resolution,
        so the masked path ships two half-width planes (even/odd columns)
        and multiplies each half of the 128 lanes separately.

STATUS — parity-contract artifact, NOT the production path (VERDICT r2
item 4 verdict, measured evidence/r3/kernel_bench_bf16.json, bf16 + mask,
fori-chained, sync-corrected; regenerate with
`python -m mcaq_yolo_tpu.scripts.bench_quant_kernel --bf16`):
    yolov8n 3-scale total   bs=32:  v4 2.01ms vs XLA single-pass 1.73ms
                            bs=128: v4 4.21ms vs XLA single-pass 2.78ms
v4 closed most of v3's gap (P5 now beats XLA, P4 within ~10%) but the
packed P3 at bs=128 sits at ~95 GB/s vs XLA's ~246 GB/s: the XLA compose derives
the bit selection in-register from the tiny (B, Ht, Wt) map (zero extra
HBM traffic, and it fuses into neighbors), while any kernel formulation
that ships pixel-resolution scalar planes pays for them.  A block-budget
sweep (512KB..4MB) moved bs=128-P3 by <6%, so this is not a pipelining
knob.  `backend='auto'` therefore stays on the XLA single-pass
(core/quantization.py); this kernel is kept as the faithful equivalent of
the reference's CUDA kernel (reference ops/src/mcaq_kernel.cu:29-95) with
the same parity contract, selectable with `backend='pallas'`.

A pure-jnp/XLA reference (`spatial_quantize_reference`) implements identical
math via the static 7-plane compose; the parity test
(tests/test_pallas_quant.py) mirrors the reference's CUDA-vs-PyTorch parity
contract (reference tests/test_smoke.py:226-246).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
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
    each (N_BITS, C) float32 — 7 x C is a few KB.  Not consumed by the v2
    kernel (which re-derives scale/zp from the qmin/d planes in-register)
    but kept as the table-building API for export paths."""
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


def _qparam_planes(bit_map: jnp.ndarray, H: int, W: int):
    """Pixel-resolution per-bit scalar planes, computed by XLA.

    Returns (qmin, d, inv_d), each (B, H, W) float32 (3-D on purpose — see
    the layout note in the module docstring):
        qmin_b  = -2^(b-1)
        d_b     = qmax_b - qmin_b = 2^b - 1
        inv_d_b = 1 / d_b
    2^b and 2^(b-1) are exact in f32, and 1/d is a single correctly-rounded
    f32 division per pixel — identical values to the per-bit constants the
    XLA reference uses, so the only parity slack left is the kernel's
    reciprocal-multiply (documented in the parity contract)."""
    b = (expand_bit_indices(bit_map, H, W) + MIN_BITS).astype(jnp.float32)
    half = jnp.exp2(b - 1.0)          # 2^(b-1), exact
    qmin = -half
    d = 2.0 * half - 1.0              # 2^b - 1, exact
    inv_d = 1.0 / d
    return qmin, d, inv_d


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _quant_body(x, qmin, d, inv_d, min_ref, max_ref):
    """Single streaming quantize/dequantize pass over a (1, bh, W, C) slab.

    qmin/d/inv_d arrive as (1, bh, W) blocks (lane = W) and are reshaped to
    (1, bh, W, 1) once — after that every use is a per-sublane scalar
    broadcast against the feature slab: no lane-1 vector arithmetic (the
    v1 kernel's downfall) and no lane-1 DMA (v2's).

        inv_s = d * (1/range_c)                 (pixel x channel)
        zp    = clip(qmin - x_min_c * inv_s, qmin, qmax)
        q     = clip(round(x * inv_s + zp), qmin, qmax)
        deq   = (q - zp) * range_c * inv_d

    Numerics note: reciprocal-multiply vs the reference path's division can
    flip round() at exact half-step boundaries; the parity contract vs the
    XLA reference is "mismatch fraction < 1%, every mismatch <= one
    quantization step" (the reference's own CUDA-vs-PyTorch tolerance class,
    reference tests/test_smoke.py:226-246)."""
    x_min = min_ref[0, :]  # (C,)
    x_max = max_ref[0, :]
    x_range = jnp.maximum(x_max - x_min, 1e-8)
    inv_range = 1.0 / x_range  # (C,) — one tiny divide per block

    qmin = qmin[..., None]  # (1, bh, W) -> (1, bh, W, 1): one small relayout
    d = d[..., None]
    inv_d = inv_d[..., None]

    qmax = qmin + d                                    # (1, bh, W, 1)
    inv_s = d * inv_range                              # (1, bh, W, C)
    zp = jnp.clip(qmin - x_min * inv_s, qmin, qmax)
    q = jnp.clip(jnp.round(x * inv_s + zp), qmin, qmax)
    return (q - zp) * (x_range * inv_d)


def _quant_kernel(x_ref, qmin_ref, d_ref, invd_ref, min_ref, max_ref, out_ref):
    x = x_ref[...].astype(jnp.float32)  # (1, bh, W, C)
    out = _quant_body(x, qmin_ref[...], d_ref[...], invd_ref[...],
                      min_ref, max_ref)
    out_ref[...] = out.astype(out_ref.dtype)


def _quant_kernel_masked(x_ref, qmin_ref, d_ref, invd_ref, min_ref, max_ref,
                         mask_ref, out_ref):
    x = x_ref[...].astype(jnp.float32)
    out = _quant_body(x, qmin_ref[...], d_ref[...], invd_ref[...],
                      min_ref, max_ref)
    # Eq.(19) fused multiply: (1, bh, W) -> (1, bh, W, 1) broadcast
    out = out * mask_ref[...][..., None]
    out_ref[...] = out.astype(out_ref.dtype)


def _quant_kernel_packed_masked(x_ref, qmin_ref, d_ref, invd_ref, min_ref,
                                max_ref, me_ref, mo_ref, out_ref):
    """Lane-packed masked variant: x is (1, bh, W/2, 2C); pixel pairs share
    a tile (so one qmin/d/invd per pair), but the soft mask is pixel-
    resolution — the even/odd half-width planes each scale their half of
    the 2C lanes."""
    x = x_ref[...].astype(jnp.float32)
    out = _quant_body(x, qmin_ref[...], d_ref[...], invd_ref[...],
                      min_ref, max_ref)
    C2 = out.shape[-1]
    C = C2 // 2
    m_e = jnp.broadcast_to(me_ref[...][..., None], out.shape[:-1] + (C,))
    m_o = jnp.broadcast_to(mo_ref[...][..., None], out.shape[:-1] + (C,))
    out = out * jnp.concatenate([m_e, m_o], axis=-1)
    out_ref[...] = out.astype(out_ref.dtype)


def _pick_block_h(H: int, W: int, C: int, budget_bytes: int = 512 << 10) -> int:
    """Rows per program, sized so the f32 slab stays ~512KB.

    Mosaic double-buffers every pipelined operand and keeps ~4 full-size
    temporaries (inv_s/zp/q/out) live, so the true VMEM footprint is ~8-9x
    the slab — a 512KB slab lands well inside the 16MB scoped-vmem limit.

    Constraint from the 3-D plane blocks (1, bh, W): Mosaic requires the
    last two block dims to be 8/128-divisible or equal to the array dims,
    so bh must divide H AND (bh % 8 == 0 or bh == H)."""
    rows = max(1, budget_bytes // max(1, W * C * 4))
    rows = min(rows, H)
    best = 0
    for r in range(8, rows + 1, 8):
        if H % r == 0:
            best = r
    if best:
        return best
    return H  # block dim == array dim is always legal


def _can_pack(B, H, W, C, bit_map_shape) -> bool:
    """Lane packing is legal when C == 64 (the lane-starved layout) and
    every even/odd column pair shares a tile: exact tile division with an
    even tile width."""
    _, Ht, Wt = bit_map_shape
    if C != 64 or W % 2:
        return False
    tw = W // Wt
    th = H // Ht
    return th * Ht == H and tw * Wt == W and tw % 2 == 0


@partial(jax.jit, static_argnames=("interpret",))
def spatial_quantize_pallas(
    x: jnp.ndarray,            # (B, H, W, C) NHWC
    bit_map: jnp.ndarray,      # (B, Ht, Wt) float (integers at eval)
    x_min: jnp.ndarray,        # (C,)
    x_max: jnp.ndarray,        # (C,)
    mask: Optional[jnp.ndarray] = None,  # (B, H, W) or (B, H, W, 1)
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused tile-wise quantize/dequantize (+ optional soft-mask multiply).

    Feature I/O stays in x.dtype (bf16 halves the HBM bytes vs the f32 the
    v3 caller shipped); arithmetic is f32 in-register.  C=64 inputs are
    viewed as (B, H, W/2, 128) to fill all vreg lanes (module docstring,
    v4)."""
    B, H, W, C = x.shape
    x_min = jnp.broadcast_to(x_min.astype(jnp.float32).reshape(-1), (C,))
    x_max = jnp.broadcast_to(x_max.astype(jnp.float32).reshape(-1), (C,))
    qmin_pix, d_pix, invd_pix = _qparam_planes(bit_map, H, W)
    if mask is not None and mask.ndim == 4:
        mask = mask[..., 0]  # (B, H, W)

    packed = _can_pack(B, H, W, C, bit_map.shape)
    if packed:
        Wk, Ck = W // 2, 2 * C
        xk = x.reshape(B, H, Wk, Ck)          # free row-major view
        qmin_k = qmin_pix[:, :, ::2]          # pairs share a tile
        d_k = d_pix[:, :, ::2]
        invd_k = invd_pix[:, :, ::2]
        tbl_min = jnp.concatenate([x_min, x_min]).reshape(1, Ck)
        tbl_max = jnp.concatenate([x_max, x_max]).reshape(1, Ck)
    else:
        Wk, Ck = W, C
        xk, qmin_k, d_k, invd_k = x, qmin_pix, d_pix, invd_pix
        tbl_min = x_min.reshape(1, Ck)
        tbl_max = x_max.reshape(1, Ck)

    bh = _pick_block_h(H, Wk, Ck)
    grid = (B, H // bh)

    x_spec = pl.BlockSpec((1, bh, Wk, Ck), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    plane_spec = pl.BlockSpec((1, bh, Wk), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec((1, Ck), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = x_spec

    itemsize = jnp.dtype(x.dtype).itemsize
    cost = pl.CostEstimate(
        flops=14 * B * H * W * C,
        bytes_accessed=2 * B * H * W * C * itemsize + 3 * B * H * Wk * 4,
        transcendentals=0,
    )

    if mask is not None:
        maskf = mask.astype(jnp.float32)
        if packed:
            out = pl.pallas_call(
                _quant_kernel_packed_masked,
                out_shape=jax.ShapeDtypeStruct(xk.shape, x.dtype),
                grid=grid,
                in_specs=[x_spec, plane_spec, plane_spec, plane_spec,
                          tbl_spec, tbl_spec, plane_spec, plane_spec],
                out_specs=out_spec,
                cost_estimate=cost,
                interpret=interpret,
            )(xk, qmin_k, d_k, invd_k, tbl_min, tbl_max,
              maskf[:, :, 0::2], maskf[:, :, 1::2])
            return out.reshape(B, H, W, C)
        return pl.pallas_call(
            _quant_kernel_masked,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=grid,
            in_specs=[x_spec, plane_spec, plane_spec, plane_spec,
                      tbl_spec, tbl_spec, plane_spec],
            out_specs=out_spec,
            cost_estimate=cost,
            interpret=interpret,
        )(x, qmin_pix, d_pix, invd_pix, tbl_min, tbl_max, maskf)

    out = pl.pallas_call(
        _quant_kernel,
        out_shape=jax.ShapeDtypeStruct(xk.shape, x.dtype),
        grid=grid,
        in_specs=[x_spec, plane_spec, plane_spec, plane_spec,
                  tbl_spec, tbl_spec],
        out_specs=out_spec,
        cost_estimate=cost,
        interpret=interpret,
    )(xk, qmin_k, d_k, invd_k, tbl_min, tbl_max)
    return out.reshape(B, H, W, C) if packed else out


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
