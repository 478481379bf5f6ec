"""
Post-training calibration protocol (paper Sec IV-D / Table X; reference
models/mcaq_yolo.py:475-508): collect per-channel min/max EMA statistics
(momentum 0.99) over ~1,000 calibration images with the quantizers in
stats-update mode, then FREEZE them so inference uses fixed scale/zero-point
per channel.

Functional formulation: the jitted calibration step threads the
'quant_stats' collection through each batch; `freeze_calibration` is pure
tree surgery on the final state.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .core.quantization import freeze_calibration
from .models import MCAQYOLO


def calibrate(
    model: MCAQYOLO,
    variables: Dict,
    dataloader,
    num_images: int = 1000,
    temperature: float = 1.0,
) -> Dict:
    """Run EMA-stat collection over the loader, then freeze.

    Returns the updated `variables` dict (new 'quant_stats').  The trained
    EMA stats themselves are already usable without this step (the reference
    Trainer never calls calibrate either — train.py checkpoints the training
    EMA stats, SURVEY.md §3.5); this is the explicit post-training protocol
    for models trained elsewhere or refreshed calibration data."""

    @jax.jit
    def calib_step(variables, images):
        _, updates = model.apply(
            variables, images,
            temperature=temperature, quantize=True,
            training=False, update_stats=True,
            mutable=["quant_stats"],
        )
        return updates["quant_stats"]

    seen = 0
    for batch in dataloader:
        images = jnp.asarray(batch["image"])
        new_stats = calib_step(variables, images)
        variables = {**variables, "quant_stats": new_stats}
        seen += images.shape[0]
        if seen >= num_images:
            break

    variables = {
        **variables,
        "quant_stats": freeze_calibration(variables["quant_stats"]),
    }
    print(f"[MCAQ] Calibration frozen after {seen} images.")
    return variables
