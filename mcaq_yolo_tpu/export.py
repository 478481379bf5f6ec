"""
Serving export: jax.export / StableHLO serialization of the MCAQ inference
graph — the deployment analogue of the reference's TensorRT plugin
(reference engine/MCAQPlugin.cpp: the quantization op as a graph node, the
soft mask folded in; kept as a reference deployment component).

`export_inference` serializes the jitted quantized forward (optionally with
decode + NMS) to a portable StableHLO artifact that any PJRT runtime can
load; `save_stablehlo` writes both the serialized bytes and the readable
MLIR text.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .models import MCAQYOLO
from .models.yolo import decode_and_nms


def make_inference_fn(
    model: MCAQYOLO,
    with_nms: bool = True,
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    max_det: int = 300,
):
    """The deployable inference program: quantized forward (+decode+NMS).

    Uses the FUSED decode_and_nms — the same program Predictor/eval_step
    run (class-max over logits; equivalence with the separate
    decode_predictions + batched_nms path is tested) — so the serving
    artifact is bit-identical to the deployed path, not a slower twin."""

    def fn(variables, images):
        raw, aux = model.apply(
            variables, images, temperature=1.0, quantize=True, training=False
        )
        if not with_nms:
            return raw, aux["avg_bits"]
        det = decode_and_nms(
            raw, model.num_classes,
            conf_threshold=conf_threshold, iou_threshold=iou_threshold,
            max_det=max_det,
        )
        return det + (aux["avg_bits"],)

    return fn


def export_inference(
    model: MCAQYOLO,
    variables: Dict,
    batch_size: int = 1,
    img_size: int = 640,
    with_nms: bool = True,
    platforms=None,
):
    """Returns a jax.export.Exported for the inference program with the
    model variables CLOSED OVER (weights baked into the artifact — the
    serving configuration; pass them as inputs instead by exporting
    `make_inference_fn(model)` directly)."""
    from jax import export as jex

    fn = make_inference_fn(model, with_nms)

    def serving_fn(images):
        return fn(variables, images)

    x_spec = jax.ShapeDtypeStruct((batch_size, img_size, img_size, 3), jnp.float32)
    exported = jex.export(
        jax.jit(serving_fn),
        platforms=platforms,  # None -> current backend
    )(x_spec)
    return exported


def save_stablehlo(
    model: MCAQYOLO,
    variables: Dict,
    out_dir: str,
    batch_size: int = 1,
    img_size: int = 640,
    with_nms: bool = True,
) -> Dict[str, str]:
    """Write <out_dir>/mcaq_yolo.{stablehlo, mlir.txt}.  Returns the paths."""
    exported = export_inference(model, variables, batch_size, img_size, with_nms)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    blob_path = out / "mcaq_yolo.stablehlo"
    blob_path.write_bytes(exported.serialize())

    txt_path = out / "mcaq_yolo.mlir.txt"
    txt_path.write_text(exported.mlir_module())

    return {"serialized": str(blob_path), "mlir": str(txt_path)}


def load_exported(path: str):
    """Round-trip: deserialize a saved artifact; call via `.call(images)`."""
    from jax import export as jex

    return jex.deserialize(Path(path).read_bytes())
