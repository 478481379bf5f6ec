"""End-to-end model forward tests (reference test_smoke.py:173-185): MCAQ
forward produces 3 per-scale bit maps, avg_bits in [2,8], detection maps of
the right shapes; gradients flow into the bit mapper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcaq_yolo_tpu.models import MCAQYOLO, YOLOv8
from mcaq_yolo_tpu.models.yolo import REG_MAX, variant_channels

# whole-model forward compiles (minutes cold) - excluded from the CI fast gate
pytestmark = pytest.mark.slow

IMG = 128  # small but valid: P3 16x16, P4 8x8, P5 4x4


@pytest.fixture(scope="module")
def model_and_vars():
    model = MCAQYOLO(variant="yolov8n", num_classes=80, bit_mapping="linear")
    x = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, training=False)
    return model, variables


def test_variant_channels():
    assert variant_channels("yolov8n") == (64, 128, 256)
    assert variant_channels("yolov8s") == (128, 256, 512)
    assert variant_channels("yolov8m") == (192, 384, 576)


def test_mcaq_forward_end_to_end(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.default_rng(0).random((2, IMG, IMG, 3), np.float32))
    raw_maps, aux = model.apply(variables, x, training=False)

    assert len(raw_maps) == 3
    for m, s in zip(raw_maps, (8, 16, 32)):
        assert m.shape == (2, IMG // s, IMG // s, 4 * REG_MAX + 80)

    assert len(aux["bit_map"]) == 3
    assert len(aux["complexity_map"]) == 3
    avg = float(aux["avg_bits"])
    assert 2.0 <= avg <= 8.0
    for c in aux["complexity_map"]:
        assert bool(jnp.all(c >= 0)) and bool(jnp.all(c <= 1))


def test_mcaq_quantize_false_passthrough(model_and_vars):
    """Stage-1 warm-up: quantize=False leaves features untouched but still
    produces complexity/bit maps."""
    model, variables = model_and_vars
    x = jnp.asarray(np.random.default_rng(1).random((1, IMG, IMG, 3), np.float32))
    raw_q, aux_q = model.apply(variables, x, quantize=True, training=False)
    raw_fp, aux_fp = model.apply(variables, x, quantize=False, training=False)
    assert len(aux_fp["bit_map"]) == 3
    # quantization must actually change the outputs when enabled
    diff = sum(
        float(jnp.abs(a - b).max()) for a, b in zip(raw_q, raw_fp)
    )
    assert diff > 0.0


def test_plain_yolov8_forward():
    model = YOLOv8(variant="yolov8n", num_classes=80)
    x = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    maps = model.apply(variables, x)
    assert len(maps) == 3
    feats = model.apply(variables, x, method="features")
    assert feats[0].shape[-1] == 64 and feats[2].shape[-1] == 256


def test_training_forward_grad_reaches_mapper():
    """Gradients from the quantized detection path must reach the complexity
    MLP via the fractional-bit composition (MLP mapper arm)."""
    model = MCAQYOLO(variant="yolov8n", num_classes=4, bit_mapping="mlp")
    x = jnp.asarray(np.random.default_rng(2).random((1, IMG, IMG, 3), np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, training=True)

    def loss(params):
        out, _ = model.apply(
            {**variables, "params": params}, x,
            temperature=1.0, training=True,
            mutable=["quant_stats", "batch_stats"],
        )
        raw_maps, aux = out
        return sum(jnp.sum(m**2) for m in raw_maps) + jnp.sum(aux["avg_bits"])

    grads = jax.grad(loss)(variables["params"])
    for sub in ("complexity_analyzer", "bit_mapper"):
        g = grads[sub]
        gn = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
        assert gn > 0.0, f"no gradient reached {sub}"
