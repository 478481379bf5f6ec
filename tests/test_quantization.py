"""Quantizer semantics: scale/zp math, STE gradients, fractional-bit
composition, EMA calibration + freeze, soft-mask near-identity init
(reference tests/test_smoke.py:103-143, 115-126)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcaq_yolo_tpu.core.quantization import (
    LearnedSoftMask,
    SpatialAdaptiveQuantization,
    compute_scale_zeropoint,
    freeze_calibration,
    quantize_tensor,
)


def test_scale_zeropoint_math():
    """Signed b-bit range; matches the reference formula exactly."""
    scale, zp = compute_scale_zeropoint(jnp.float32(-1.0), jnp.float32(1.0), 8)
    np.testing.assert_allclose(float(scale), 2.0 / 255.0, rtol=1e-6)
    assert -128.0 <= float(zp) <= 127.0


def test_quantize_levels():
    """2-bit quantization of [0,1] data yields at most 4 distinct values."""
    x = jnp.linspace(0.0, 1.0, 101)
    xq = quantize_tensor(x, x.min(), x.max(), 2, training=False)
    assert len(np.unique(np.asarray(xq).round(6))) <= 4


def test_fractional_bit_gradient_to_bit_map():
    """Loss must be differentiable w.r.t. the CONTINUOUS bit map through the
    fractional composition (reference test_smoke.py:103-112)."""
    quant = SpatialAdaptiveQuantization(smooth_transitions=False)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 4)).astype(np.float32))
    bit_map = jnp.full((1, 2, 2), 4.5)
    variables = quant.init(jax.random.PRNGKey(0), x, bit_map, training=True)

    def loss(bm):
        out, _ = quant.apply(
            variables, x, bm, training=True, mutable=["quant_stats"]
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(bit_map)
    assert float(jnp.abs(g).sum()) > 0.0


def test_ste_identity_gradient_wrt_input():
    quant = SpatialAdaptiveQuantization(smooth_transitions=False)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 8, 4)).astype(np.float32))
    bit_map = jnp.full((1, 2, 2), 4.0)
    variables = quant.init(jax.random.PRNGKey(0), x, bit_map, training=True)

    def loss(xx):
        out, _ = quant.apply(
            variables, xx, bit_map, training=True, mutable=["quant_stats"]
        )
        return jnp.sum(out)

    g = jax.grad(loss)(x)
    # STE: gradient is exactly 1 everywhere (identity), per the reference STE
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-5)


def test_calibration_ema_and_freeze():
    """EMA stats move while unfrozen, freeze pins them
    (reference test_smoke.py:129-139)."""
    quant = SpatialAdaptiveQuantization(smooth_transitions=False)
    rng = np.random.default_rng(2)
    x1 = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    bit_map = jnp.full((2, 2, 2), 4.0)
    variables = quant.init(jax.random.PRNGKey(0), x1, bit_map, training=True)

    _, s1 = quant.apply(variables, x1, bit_map, training=True, mutable=["quant_stats"])
    stats1 = s1["quant_stats"]
    assert int(stats1["num_batches"]) == 1

    x2 = jnp.asarray((rng.normal(size=(2, 8, 8, 4)) * 10).astype(np.float32))
    _, s2 = quant.apply(
        {**variables, "quant_stats": stats1}, x2, bit_map,
        training=True, mutable=["quant_stats"],
    )
    stats2 = s2["quant_stats"]
    assert int(stats2["num_batches"]) == 2
    assert not np.allclose(
        np.asarray(stats1["running_max"]), np.asarray(stats2["running_max"])
    )

    frozen = freeze_calibration(stats2)
    assert bool(frozen["frozen"])
    _, s3 = quant.apply(
        {**variables, "quant_stats": frozen}, x1 * 100, bit_map,
        training=True, mutable=["quant_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(s3["quant_stats"]["running_max"]),
        np.asarray(frozen["running_max"]),
    )


def test_learned_soft_mask_near_identity_init():
    """m(p) ~ 0.982 at init, and both convs receive gradients
    (reference test_smoke.py:115-126)."""
    mask = LearnedSoftMask()
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 16, 16, 4)).astype(np.float32))
    bit_map = jnp.full((1, 4, 4), 6.0)
    variables = mask.init(jax.random.PRNGKey(0), bit_map, x)
    m = mask.apply(variables, bit_map, x)
    assert m.shape == (1, 16, 16, 1)
    np.testing.assert_allclose(np.asarray(m), 0.982, atol=0.01)

    def loss(params):
        out = mask.apply({"params": params}, bit_map, x)
        return jnp.sum((out - 0.5) ** 2)

    grads = jax.grad(loss)(variables["params"])
    for name, g in grads.items():
        gn = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
        assert gn > 0.0, f"{name} got zero gradient at init"


def test_eval_integer_composition_matches_training_integer_bits():
    """With an integer bit map, the training fractional path reduces to the
    eval composition (frac == 0) modulo the STE wrapper."""
    quant = SpatialAdaptiveQuantization(smooth_transitions=False)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(1, 8, 8, 4)).astype(np.float32))
    bit_map = jnp.asarray(np.array([[[2.0, 4.0], [6.0, 8.0]]], np.float32))
    variables = quant.init(jax.random.PRNGKey(0), x, bit_map, training=False)

    out_eval = quant.apply(variables, x, bit_map, training=False)
    out_train, _ = quant.apply(
        variables, x, bit_map, training=True, update_stats=False,
        mutable=["quant_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(out_eval), np.asarray(out_train), atol=1e-5
    )
