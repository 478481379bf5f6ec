"""Pallas fused quantization kernel vs pure-jnp reference parity — the TPU
analogue of the reference's CUDA-vs-PyTorch parity test
(reference tests/test_smoke.py:226-246).  Runs the kernel in interpret mode
on CPU; on real TPU the same assertions hold compiled (exercised by bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcaq_yolo_tpu.core.quantization import SpatialAdaptiveQuantization
from mcaq_yolo_tpu.ops.pallas_quant import (
    expand_bit_indices,
    precompute_qparams,
    spatial_quantize_pallas,
    spatial_quantize_reference,
)


def _inputs(B=2, H=16, W=16, C=8, key=0):
    rng = np.random.default_rng(key)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32))
    bit_map = jnp.asarray(
        rng.integers(2, 9, (B, 4, 4)).astype(np.float32)
    )
    x_min = x.min(axis=(0, 1, 2))
    x_max = x.max(axis=(0, 1, 2))
    return x, bit_map, x_min, x_max


def assert_quant_parity(out, ref, bit_map, x_min, x_max, H, W,
                        max_mismatch_frac=0.01):
    """The kernel's single-pass reciprocal-multiply arithmetic can flip
    round() at exact half-step boundaries vs the reference's division path
    (same tolerance class as the reference's CUDA-vs-PyTorch contract,
    reference tests/test_smoke.py:226-246).  Contract: every mismatch is at
    most ONE quantization step of its tile's bit width, and the mismatch
    fraction is < 1%."""
    out = np.asarray(out)
    ref = np.asarray(ref)
    e = np.abs(out - ref)
    bad = e > 1e-6
    frac = bad.mean()
    assert frac < max_mismatch_frac, f"mismatch fraction {frac:.4f}"
    if bad.any():
        bits = np.asarray(
            expand_bit_indices(bit_map, H, W)
        )[..., None] + 2  # (B, H, W, 1)
        rng_ = np.asarray(x_max - x_min).reshape(1, 1, 1, -1)
        steps = rng_ / (2.0 ** bits - 1.0)
        steps = np.broadcast_to(steps, e.shape)
        ratio = e[bad] / steps[bad]
        assert ratio.max() <= 1.0 + 1e-3, f"error exceeds one step: {ratio.max()}"


def test_kernel_parity_no_mask():
    x, bit_map, x_min, x_max = _inputs()
    ref = spatial_quantize_reference(x, bit_map, x_min, x_max)
    ker = spatial_quantize_pallas(x, bit_map, x_min, x_max, interpret=True)
    assert_quant_parity(ker, ref, bit_map, x_min, x_max, 16, 16)


def test_kernel_parity_with_mask():
    x, bit_map, x_min, x_max = _inputs(key=1)
    mask = jnp.asarray(
        np.random.default_rng(2).uniform(0.9, 1.0, (2, 16, 16)).astype(np.float32)
    )
    ref = spatial_quantize_reference(x, bit_map, x_min, x_max, mask)
    ker = spatial_quantize_pallas(x, bit_map, x_min, x_max, mask, interpret=True)
    assert_quant_parity(ker, ref, bit_map, x_min, x_max, 16, 16)


def test_kernel_parity_vs_module_integer_path():
    """The fused kernel must agree with the quantizer module's eval
    composition when fed the module's frozen calibration range."""
    x, bit_map, x_min, x_max = _inputs(key=3)
    quant = SpatialAdaptiveQuantization(smooth_transitions=False)
    variables = quant.init(jax.random.PRNGKey(0), x, bit_map, training=False)
    variables = {
        "quant_stats": {
            **variables["quant_stats"],
            "running_min": x_min,
            "running_max": x_max,
            "num_batches": jnp.ones((), jnp.int32),
            "frozen": jnp.ones((), jnp.bool_),
        }
    }
    module_out = quant.apply(variables, x, bit_map, training=False)
    kernel_out = spatial_quantize_pallas(x, bit_map, x_min, x_max, interpret=True)
    assert_quant_parity(kernel_out, module_out, bit_map, x_min, x_max, 16, 16)


def test_expand_bit_indices_remainder_rule():
    """Remainder pixels go to the LAST tile (CUDA kernel clamping rule)."""
    bit_map = jnp.asarray([[[2.0, 8.0]]])  # (1, 1, 2)
    idx = expand_bit_indices(bit_map, 3, 5)  # 5 cols / 2 tiles -> tw=2
    row = np.asarray(idx[0, 0])
    assert row.tolist() == [0, 0, 6, 6, 6]  # col 4 clamps into tile 1


def test_precompute_qparams_shapes_and_values():
    x_min = jnp.asarray([-1.0, 0.0])
    x_max = jnp.asarray([1.0, 2.0])
    scale, inv_scale, zp = precompute_qparams(x_min, x_max)
    assert scale.shape == (7, 2)
    # 8-bit row: scale = range/255
    np.testing.assert_allclose(np.asarray(scale[6]), [2 / 255, 2 / 255], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(scale * inv_scale), 1.0, rtol=1e-5
    )


def test_reference_respects_bit_planes():
    """2-bit tiles get <=4 levels, 8-bit tiles are near-lossless."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 8, 8, 2)).astype(np.float32))
    bit_map = jnp.asarray([[[2.0, 8.0]]], jnp.float32)  # left half 2b, right 8b
    out = spatial_quantize_reference(
        x, bit_map, x.min(axis=(0, 1, 2)), x.max(axis=(0, 1, 2))
    )
    left = np.asarray(out[0, :, :4, 0])
    right_err = float(jnp.abs(out[0, :, 4:] - x[0, :, 4:]).max())
    assert len(np.unique(left.round(5))) <= 4
    assert right_err < 0.01


def test_kernel_parity_packed_lanes_no_mask():
    """v4 lane-packed path: C=64 viewed as (B, H, W/2, 128).  Same parity
    contract as the unpacked path."""
    from mcaq_yolo_tpu.ops.pallas_quant import _can_pack

    x, bit_map, x_min, x_max = _inputs(B=2, H=16, W=16, C=64, key=5)
    assert _can_pack(2, 16, 16, 64, bit_map.shape)
    out = spatial_quantize_pallas(x, bit_map, x_min, x_max, interpret=True)
    ref = spatial_quantize_reference(x, bit_map, x_min, x_max)
    assert_quant_parity(out, ref, bit_map, x_min, x_max, 16, 16)


def test_kernel_parity_packed_lanes_with_mask():
    """Packed path with the pixel-resolution Eq.19 mask: even/odd columns
    carry DIFFERENT mask values, so this catches any even/odd lane-half
    mix-up."""
    x, bit_map, x_min, x_max = _inputs(B=2, H=16, W=16, C=64, key=6)
    rng = np.random.default_rng(7)
    mask = jnp.asarray(rng.uniform(0.5, 1.0, (2, 16, 16)).astype(np.float32))
    out = spatial_quantize_pallas(x, bit_map, x_min, x_max, mask=mask,
                                  interpret=True)
    ref = spatial_quantize_reference(x, bit_map, x_min, x_max, mask=mask)
    # masked outputs are no longer exact quantization levels; compare to the
    # reference's own masked output with the same one-step contract on the
    # unmasked values' scale
    e = np.abs(np.asarray(out) - np.asarray(ref))
    assert (e > 1e-6).mean() < 0.01
    assert e.max() < np.asarray(x_max - x_min).max() / 3.0  # << one 2-bit step


def test_kernel_parity_bf16_io():
    """bf16 feature I/O (v4): in-register math is f32, I/O is bf16 — parity
    vs the reference computed on the SAME bf16-rounded input, to one
    quantization step plus bf16 output rounding."""
    x, bit_map, x_min, x_max = _inputs(B=1, H=16, W=16, C=64, key=8)
    xb = x.astype(jnp.bfloat16)
    out = spatial_quantize_pallas(xb, bit_map, x_min, x_max, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = spatial_quantize_reference(xb, bit_map, x_min, x_max)
    o = np.asarray(out, np.float32)
    r = np.asarray(ref, np.float32)
    # both sides round to bf16 at the end; mismatches can differ by one
    # quant step then one bf16 ulp — bound loosely by one 2-bit step
    step2 = np.asarray(x_max - x_min).max() / 3.0
    assert np.abs(o - r).max() <= step2 * (1 + 1 / 128)
    assert (np.abs(o - r) > 0).mean() < 0.02
