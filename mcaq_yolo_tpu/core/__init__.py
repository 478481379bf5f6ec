"""Core MCAQ algorithms: morphology metrics, bit allocation, quantization,
curriculum scheduling.  Everything here is pure JAX (jit/vmap/grad friendly);
the exact OpenCV reference backend lives in `morphology_cv2` (host-side)."""

from .curriculum import CurriculumScheduler  # noqa: F401
from .bit_allocation import (  # noqa: F401
    ComplexityToBitMappingNetwork,
    ConstantBitMapper,
    LinearBitMapper,
    linear_bit_map,
)
from .morphology import MorphologicalComplexityAnalyzer, compute_phi_tiles  # noqa: F401
from .quantization import (  # noqa: F401
    SpatialAdaptiveQuantization,
    LearnedSoftMask,
    QuantizerState,
    quantize_tensor,
    compute_scale_zeropoint,
)
