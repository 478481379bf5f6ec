"""
MCAQ-YOLO assembly: YOLOv8 + tile-wise mixed-precision quantization of the
backbone C3/C4/C5 outputs before the FPN neck (paper Sec IV-D).

Structural redesign vs the reference (models/mcaq_yolo.py:344,402-473):
the reference injects MCAQ through PyTorch forward hooks driven by a mutable
`_mcaq_state` dict.  Here the dataflow is explicit and pure: the backbone
returns (C3, C4, C5); `mcaq_transform` maps each to
(feat_q, complexity, bit_map); the neck consumes the quantized maps; all aux
outputs are threaded through the return value.  Quantizer EMA statistics live
in the flax 'quant_stats' collection; BatchNorm in 'batch_stats'.

One complexity analyzer and one bit mapper are SHARED across scales; each
scale gets its own quantizer (distinct per-channel EMA shapes — reference
models/mcaq_yolo.py:307-313) which embeds its own learned soft mask.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..core.bit_allocation import (
    ComplexityToBitMappingNetwork,
    ConstantBitMapper,
    LinearBitMapper,
    percentile_normalize,
)
from ..core.morphology import MorphologicalComplexityAnalyzer
from ..core.quantization import SpatialAdaptiveQuantization
from .yolo import DetectHead, YOLOv8Backbone, YOLOv8Neck, normalize_image


class MCAQYOLO(nn.Module):
    """MCAQ-YOLO detection model.

    __call__(x NHWC, temperature, quantize, training) ->
        (raw_maps [3 x (B, H_s, W_s, 4*REG_MAX+nc)], aux_info dict)

    aux_info mirrors the reference's contract
    (reference models/mcaq_yolo.py:568-587): per-scale 'complexity_map' and
    'bit_map' lists, 'avg_bits' (mean over scales of tile-mean bits — paper
    Table II footnote), 'quantized_features', 'feature_layers'.

    `quantize=False` (curriculum Stage-1 warm-up) bypasses the quantizer but
    still produces complexity/bit maps so Lbit/Lsmooth keep training the
    mapping networks (reference models/mcaq_yolo.py:444-455).
    """

    variant: str = "yolov8n"
    num_classes: int = 80
    min_bits: int = 2
    max_bits: int = 8
    target_bits: float = 4.0
    grid_size: int = 8
    bit_mapping: str = "mlp"  # 'mlp' (Eq.13-17) | 'linear' (ablation) | 'constant' (matched-budget PTQ control)
    constant_bits: float = 4.0  # only used when bit_mapping == 'constant'
    monotone_param: str = "softplus"  # 'softplus' (default, r4) | 'abs' (reference Eq.18 parity mode)
    normalize_complexity: bool = False
    calibration_mode: str = "minmax"
    smooth_transitions: bool = True
    quant_backend: str = "auto"  # eval-path backend: 'auto' | 'pallas' | 'jnp'
    morph_downsample: int = 1  # opt-in metric-pipeline throughput lever
    morph_tile_engine: str = "lanes"  # 'lanes' (TPU-native) | 'rows'
    dtype: jnp.dtype = jnp.float32  # bf16 network compute; MCAQ math stays fp32

    def setup(self):
        self.backbone = YOLOv8Backbone(self.variant, dtype=self.dtype)
        self.neck = YOLOv8Neck(self.variant, dtype=self.dtype)
        self.head = DetectHead(self.num_classes, self.variant, dtype=self.dtype)

        self.complexity_analyzer = MorphologicalComplexityAnalyzer(
            grid_size=self.grid_size, downsample=self.morph_downsample,
            tile_engine=self.morph_tile_engine,
        )
        if self.bit_mapping == "constant":
            self.bit_mapper = ConstantBitMapper(
                self.constant_bits, self.min_bits, self.max_bits)
        elif self.bit_mapping == "linear":
            self.bit_mapper = LinearBitMapper(self.min_bits, self.max_bits)
        else:
            self.bit_mapper = ComplexityToBitMappingNetwork(
                self.min_bits, self.max_bits, hidden_dims=(32, 64, 32),
                monotone_param=self.monotone_param,
            )
        # one quantizer per scale: P3/P4/P5 channel counts differ
        self.quantizers = [
            SpatialAdaptiveQuantization(
                calibration_mode=self.calibration_mode,
                smooth_transitions=self.smooth_transitions,
                per_channel=True,
                backend=self.quant_backend,
                name=f"quantizer_p{i + 3}",
            )
            for i in range(3)
        ]

    def mcaq_transform(
        self,
        feat: jnp.ndarray,
        scale_idx: int,
        temperature: float,
        quantize: bool,
        training: bool,
        update_stats: Optional[bool] = None,
    ):
        """Pure per-scale MCAQ step: complexity -> bit map -> quantize.
        The functional equivalent of the reference's forward hook
        (models/mcaq_yolo.py:402-457)."""
        complexity = self.complexity_analyzer(feat)
        if self.normalize_complexity:
            complexity = percentile_normalize(complexity)
        bit_map = self.bit_mapper(
            complexity,
            temperature,
            return_continuous=training,
            training=training,
        )
        if quantize:
            feat_q = self.quantizers[scale_idx](
                feat, bit_map, training=training, update_stats=update_stats
            )
        else:
            feat_q = feat
        return feat_q, complexity, bit_map

    def __call__(
        self,
        x: jnp.ndarray,
        temperature: float = 1.0,
        quantize: bool = True,
        training: bool = False,
        update_stats: Optional[bool] = None,
        return_aux: bool = True,
    ):
        feats = self.backbone(normalize_image(x), training)

        feats_q, complexity_maps, bit_maps = [], [], []
        for i, f in enumerate(feats):
            fq, c, b = self.mcaq_transform(
                f, i, temperature, quantize, training, update_stats
            )
            feats_q.append(fq)
            complexity_maps.append(c)
            bit_maps.append(b)

        p3, p4, p5 = self.neck(*feats_q, training=training)
        raw_maps = self.head([p3, p4, p5], training)

        if not return_aux:
            return raw_maps

        avg_bits = jnp.stack(
            [b.astype(jnp.float32).mean() for b in bit_maps]
        ).mean()
        aux_info: Dict = {
            "complexity_map": complexity_maps,
            "bit_map": bit_maps,
            "avg_bits": avg_bits,
            "quantized_features": feats_q,
            "feature_layers": [4, 6, 9],  # reference indices, for parity
            "detailed_metrics": {},
        }
        return raw_maps, aux_info

    def backbone_features(self, x: jnp.ndarray, training: bool = False):
        """Unquantized backbone features — the student-side taps used for
        feature-level KD (compared against the teacher's)."""
        return self.backbone(normalize_image(x), training)

    def score_image(self, x: jnp.ndarray) -> jnp.ndarray:
        """Deterministic Eq.(8) per-image complexity (Algorithm 3 line 1),
        computed on the input image — the offline dataset-scoring entry."""
        return self.complexity_analyzer.score_image(normalize_image(x))
