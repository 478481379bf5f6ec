"""Tests for utils/model_utils.py (reference utils/model_utils.py:11-179):
parameter counts, size, steady-state profiling (sync-barrier bracketed),
standalone weight fake-quantization, and activation-range calibration."""

import jax
import jax.numpy as jnp
import numpy as np

from mcaq_yolo_tpu.utils.model_utils import (
    apply_weight_quantization,
    calibrate_activation_ranges,
    count_parameters,
    get_model_size,
    profile_model,
)


def _params():
    return {
        "backbone": {"kernel": jnp.ones((3, 3, 4, 8)), "bias": jnp.zeros(8)},
        "head": {"kernel": jnp.full((8, 2), 0.5)},
    }


def test_count_parameters_totals_and_modules():
    counts = count_parameters(_params())
    assert counts["backbone"] == 3 * 3 * 4 * 8 + 8
    assert counts["head"] == 16
    assert counts["total"] == counts["backbone"] + counts["head"]


def test_get_model_size_scales_with_bits():
    p = _params()
    mb32 = get_model_size(p, bits_per_param=32.0)
    mb8 = get_model_size(p, bits_per_param=8.0)
    assert np.isclose(mb32, 4.0 * mb8)
    assert mb32 == count_parameters(p)["total"] * 4 / 1e6


def test_profile_model_reports_positive_throughput():
    fn = jax.jit(lambda x: jnp.tanh(x) @ x.T)
    x = jnp.ones((4, 16))
    stats = profile_model(fn, x, num_iters=3, warmup=1)
    assert stats["total_s"] > 0
    assert stats["iter_ms"] > 0
    # fps accounts for the batch dimension of the example input
    assert np.isclose(stats["fps"], 3 * 4 / stats["total_s"])


def test_apply_weight_quantization_bounded_error_and_bias_passthrough():
    p = _params()
    key = jax.random.PRNGKey(0)
    p["backbone"]["kernel"] = jax.random.normal(key, (3, 3, 4, 8))
    q = apply_weight_quantization(p, bits=8, per_channel=True)
    # biases / 1-D leaves untouched
    assert (q["backbone"]["bias"] == p["backbone"]["bias"]).all()
    # shapes preserved; error bounded by one per-channel quantization step
    k, kq = p["backbone"]["kernel"], q["backbone"]["kernel"]
    assert kq.shape == k.shape
    span = k.max(axis=(0, 1, 2)) - k.min(axis=(0, 1, 2))
    step = span / (2**8 - 1)
    assert (jnp.abs(kq - k) <= step[None, None, None, :] + 1e-6).all()
    # lower bit width -> coarser (not finer) reconstruction
    q2 = apply_weight_quantization(p, bits=2, per_channel=True)
    err8 = float(jnp.abs(kq - k).mean())
    err2 = float(jnp.abs(q2["backbone"]["kernel"] - k).mean())
    assert err2 > err8


def test_calibrate_activation_ranges_accumulates_extremes():
    def feats(x):
        return {"p3": x * 2.0, "p4": x - 1.0}

    batches = [jnp.full((2, 4), v) for v in (-1.0, 3.0, 0.5)]
    ranges = calibrate_activation_ranges(feats, batches, max_batches=8)
    assert ranges["p3"] == {"min": -2.0, "max": 6.0}
    assert ranges["p4"] == {"min": -2.0, "max": 2.0}


def test_calibrate_activation_ranges_respects_max_batches():
    seen = []

    def feats(x):
        seen.append(1)
        return [x]

    batches = [jnp.zeros((1, 2))] * 5
    calibrate_activation_ranges(feats, batches, max_batches=2)
    assert len(seen) == 2
