"""Export (StableHLO) round-trip + calibration protocol tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mcaq_yolo_tpu.calibrate import calibrate
from mcaq_yolo_tpu.export import export_inference, load_exported, save_stablehlo
from mcaq_yolo_tpu.models import MCAQYOLO
import pytest

# StableHLO export round-trip - excluded from the CI fast gate
pytestmark = pytest.mark.slow

IMG = 64  # tiny: export/calibrate semantics, not accuracy


def _tiny_model():
    model = MCAQYOLO(variant="yolov8n", num_classes=4, bit_mapping="linear",
                     grid_size=4)
    x = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, training=False)
    return model, variables


def test_export_roundtrip(tmp_path):
    model, variables = _tiny_model()
    paths = save_stablehlo(model, variables, str(tmp_path), batch_size=1,
                           img_size=IMG, with_nms=False)
    loaded = load_exported(paths["serialized"])
    x = jnp.asarray(np.random.default_rng(0).random((1, IMG, IMG, 3), np.float32))

    # direct apply for comparison
    raw, aux = model.apply(variables, x, temperature=1.0, training=False)
    out = loaded.call(x)
    raw_loaded, bits_loaded = out
    assert len(raw_loaded) == 3
    for a, b in zip(raw, raw_loaded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    # compiled-vs-eager float differences can flip a tile's rounded bit
    # width at an exact boundary (the bit map is a step function of C);
    # tolerate up to one tile flip in the scale-averaged mean.
    np.testing.assert_allclose(
        float(aux["avg_bits"]), float(bits_loaded), atol=0.35
    )
    # the MLIR text exists and mentions stablehlo
    mlir = open(paths["mlir"]).read()
    assert "stablehlo" in mlir or "func.func" in mlir


def test_calibrate_freezes_stats():
    model, variables = _tiny_model()
    rng = np.random.default_rng(1)

    def loader():
        for _ in range(3):
            yield {"image": rng.random((2, IMG, IMG, 3)).astype(np.float32)}

    variables = calibrate(model, variables, loader(), num_images=6)
    qs = variables["quant_stats"]
    # every quantizer frozen with >0 batches tracked
    froze = [v for k, v in jax.tree_util.tree_flatten_with_path(qs)[0]
             if "frozen" in str(k)]
    nb = [v for k, v in jax.tree_util.tree_flatten_with_path(qs)[0]
          if "num_batches" in str(k)]
    assert froze and all(bool(f) for f in froze)
    assert nb and all(int(n) >= 3 for n in nb)

    # post-freeze: stats no longer move
    big = {"image": (rng.random((2, IMG, IMG, 3)) * 100).astype(np.float32)}
    v2 = calibrate(model, variables, iter([big]), num_images=2)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_flatten_with_path(qs)[0],
        jax.tree_util.tree_flatten_with_path(v2["quant_stats"])[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
