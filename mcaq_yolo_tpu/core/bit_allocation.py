"""
Bit Allocation — complexity -> per-tile bit width (paper Eq.13-18).

Two mappers with the same call contract (reference core/bit_allocation.py):

  * `ComplexityToBitMappingNetwork` — learnable monotone MLP
    z0 = [C, C^2, log1p(C)] -> 32 -> 64 -> 32 -> 1 with BatchNorm+ReLU,
    sigmoid scaled to [bmin, bmax], temperature multiply (floored at 0.1),
    straight-through clamp and round.  Monotonicity via |W| projection of
    Dense kernels AND BatchNorm scales (Eq.18) — here a pure params->params
    function applied after each optimizer step.
  * `LinearBitMapper` / `linear_bit_map` — the paper's parameter-free
    'Linear mapping' ablation with per-image 2-98% percentile normalization
    and the flat-map absolute-complexity gate (eps_spread).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .ste import ste, ste_clamp, ste_round


def normalize_complexity_shape(complexity: jnp.ndarray) -> jnp.ndarray:
    """Normalize a complexity tensor to (B, H, W)
    (reference bit_allocation.py:144-172).

    Accepted: (H, W) -> (1, H, W); (B, H, W) unchanged;
    (B, H, W, C) -> channel-mean (NHWC — the TPU-native layout)."""
    if complexity.ndim == 2:
        return complexity[None]
    if complexity.ndim == 3:
        return complexity
    if complexity.ndim == 4:
        return complexity.mean(axis=-1)
    raise ValueError(f"Unsupported complexity ndim={complexity.ndim}, expected 2-4.")


def _finalize_bit_map(
    bit_map: jnp.ndarray,
    min_bits: float,
    max_bits: float,
    temperature: Optional[float],
    return_continuous: bool,
) -> jnp.ndarray:
    """Shared tail: temperature multiply (Algorithm 3 line 13), STE clamp,
    optional STE round (reference bit_allocation.py:263-279)."""
    if temperature is not None:
        bit_map = bit_map * jnp.maximum(jnp.asarray(temperature, bit_map.dtype), 0.1)
    bit_map = ste_clamp(bit_map, min_bits, max_bits)
    if not return_continuous:
        bit_map = ste_round(bit_map)
    return bit_map


def percentile_normalize(c: jnp.ndarray, eps_spread: float = 1e-3) -> jnp.ndarray:
    """Per-image 2-98% percentile normalization with the flat-map gate
    (reference bit_allocation.py:52-68): if the spread is below eps_spread the
    map is spatially flat and the ABSOLUTE complexity is used instead, so a
    uniformly mid-complexity image lands on mid bits rather than all-bmin."""
    B = c.shape[0]
    flat = c.reshape(B, -1).astype(jnp.float32)
    lo = jnp.quantile(flat, 0.02, axis=1).reshape(B, 1, 1)
    hi = jnp.quantile(flat, 0.98, axis=1).reshape(B, 1, 1)
    spread = hi - lo
    rel = jnp.clip((c - lo) / (spread + 1e-8), 0.0, 1.0)
    return jnp.where(spread > eps_spread, rel, jnp.clip(c, 0.0, 1.0))


def linear_bit_map(
    complexity: jnp.ndarray,
    min_bits: float = 2.0,
    max_bits: float = 8.0,
    temperature: Optional[float] = None,
    return_continuous: bool = False,
    eps_spread: float = 1e-3,
) -> jnp.ndarray:
    """Paper Table V/VIII 'Linear mapping (no MLP)' ablation
    (reference bit_allocation.py:12-80): b = bmin + (bmax-bmin) * normalize(C)."""
    c = normalize_complexity_shape(complexity)
    cn = percentile_normalize(c, eps_spread)
    bit_map = min_bits + (max_bits - min_bits) * cn
    return _finalize_bit_map(bit_map, min_bits, max_bits, temperature, return_continuous)


class LinearBitMapper(nn.Module):
    """Module wrapper over `linear_bit_map` for interface parity with the
    MLP mapper (parameter-free; enforce_weight_constraints is a no-op)."""

    min_bits: int = 2
    max_bits: int = 8
    eps_spread: float = 1e-3

    def __call__(
        self,
        complexity: jnp.ndarray,
        temperature: Optional[float] = None,
        return_continuous: bool = False,
        training: bool = False,
    ) -> jnp.ndarray:
        del training  # parameter-free; no BatchNorm
        return linear_bit_map(
            complexity,
            float(self.min_bits),
            float(self.max_bits),
            temperature,
            return_continuous,
            self.eps_spread,
        )


class ConstantBitMapper(nn.Module):
    """Uniform-bits mapper: ignores complexity, emits a constant map at
    `bits` (rounded to the nearest STE-free integer when
    return_continuous=False).  The matched-budget PTQ control arm — the
    reference's M4 script uses the same idea per-image
    (reference scripts/m4_variation_gain.py:37-42); here the constant is a
    protocol parameter so a post-hoc arm can be pinned to the bit budget the
    MCAQ arm actually achieved (VERDICT r4 weak-6)."""

    bits: float = 4.0
    min_bits: int = 2
    max_bits: int = 8

    def __call__(
        self,
        complexity: jnp.ndarray,
        temperature: Optional[float] = None,
        return_continuous: bool = False,
        training: bool = False,
    ) -> jnp.ndarray:
        del temperature, training
        b = float(min(max(self.bits, self.min_bits), self.max_bits))
        if not return_continuous:
            b = round(b)
        return jnp.full(complexity.shape, b, complexity.dtype)


def _abs_xavier(gain: float):
    """|xavier_uniform(gain)| init — the reference's monotone init
    (reference bit_allocation.py:174-184)."""
    base = nn.initializers.variance_scaling(gain * gain, "fan_avg", "uniform")

    def init(key, shape, dtype=jnp.float32):
        return jnp.abs(base(key, shape, dtype))

    return init


def _inv_softplus_abs_xavier(gain: float):
    """theta init such that softplus(theta) == |xavier_uniform(gain)|."""
    base = _abs_xavier(gain)

    def init(key, shape, dtype=jnp.float32):
        w = jnp.maximum(base(key, shape, dtype), 1e-4)
        return jnp.log(jnp.expm1(w))

    return init


class MonotoneDense(nn.Module):
    """Dense layer whose effective kernel is softplus(theta) — positive BY
    PARAMETERIZATION, so Eq.18 monotonicity needs no post-step |W|
    projection for this layer.

    Why it exists (measured, r3): the reference's abs-projection
    (reference bit_allocation.py:186-197, W.abs_() after every step) is a
    zero-trap under a persistent downward loss pressure: the optimizer
    pushes a kernel entry negative, the projection reflects it back, and
    the entry oscillates in [0, lr_step] — the deployed mapper's deep
    Dense kernels settle at ~1e-5 and b(C) degenerates to a constant
    (spread 2.4e-5 over the full complexity range at the 4.0-bit target).
    softplus(theta) shrinks smoothly instead and recovers symmetrically
    when the detection loss wants bits back, so spatial allocation can
    re-emerge.  The param is named 'theta' so `enforce_monotonic_params`
    (which matches 'kernel'/'scale') leaves it alone."""

    features: int
    gain: float = 0.5

    @nn.compact
    def __call__(self, x):
        theta = self.param("theta", _inv_softplus_abs_xavier(self.gain),
                           (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.constant(0.1),
                          (self.features,))
        return x @ jax.nn.softplus(theta) + bias


class ComplexityToBitMappingNetwork(nn.Module):
    """Learnable complexity->bits MLP (paper Eq.13-17; reference
    bit_allocation.py:83-280).

        z0 = [C, C^2, log(1+C)]                        (Eq.13)
        h  = ReLU(BN(W z + b)) x3, dims [32, 64, 32]   (Eq.14-16, Table X)
        b  = bmin + (bmax-bmin) * sigmoid(w4 h3 + b4)  (Eq.17)
        b  = b * alpha_t, STE clamp [bmin,bmax], STE round

    Temperature semantics: with alpha_t annealing 10 -> 1, early training
    saturates every tile at bmax after clamping (Stage-1 high-precision
    warm-up); the straight-through clamp keeps Lbit's gradient alive at
    saturation.

    BatchNorm uses the 'batch_stats' flax collection; pass training=True to
    use batch statistics and update the running ones (the caller must make
    'batch_stats' mutable in .apply)."""

    min_bits: int = 2
    max_bits: int = 8
    hidden_dims: tuple = (32, 64, 32)
    enforce_monotonicity: bool = True
    # 'softplus' (DEFAULT since r4) = kernels are softplus(theta), positive
    # by construction (see MonotoneDense); BatchNorm scales still use the
    # |.| projection.  'abs' = the reference's exact Eq.18 semantics
    # (|xavier| init + post-step |W| projection via
    # enforce_monotonic_params), kept as the documented parity mode: it is
    # a measured zero-trap — every committed 640px training run with 'abs'
    # (r3 ungated, r4 lambda1-gated, r4 lambda1+lambda2-gated) deployed a
    # spatially constant b(C) (continuous std 0.0) even though the
    # complexity input varied (std 0.27), so the paper's spatial-allocation
    # mechanism only survives training under the softplus parameterization
    # (evidence/r4/quality_seed0_abs_gated.json, PARITY.md 'MLP-mapper
    # degeneracy').
    monotone_param: str = "softplus"

    @nn.compact
    def __call__(
        self,
        complexity: jnp.ndarray,
        temperature: Optional[float] = None,
        return_continuous: bool = False,
        training: bool = False,
    ) -> jnp.ndarray:
        c = normalize_complexity_shape(complexity)
        c = jnp.clip(c, 0.0, 1.0)
        B, H, W = c.shape

        z = c.reshape(-1, 1)
        z0 = jnp.concatenate([z, z**2, jnp.log1p(z)], axis=-1)  # (N, 3)

        kinit = _abs_xavier(0.5) if self.enforce_monotonicity else (
            nn.initializers.variance_scaling(0.25, "fan_avg", "uniform")
        )
        binit = nn.initializers.constant(0.1)
        softplus = self.enforce_monotonicity and self.monotone_param == "softplus"

        def dense(dim):
            if softplus:
                return MonotoneDense(dim)
            return nn.Dense(dim, kernel_init=kinit, bias_init=binit)

        # softplus mode also swaps ReLU for leaky-ReLU: the Lbit crush
        # window (temperature-saturated stages, see MonotoneDense) drives
        # hidden biases down until every ReLU unit is dead — an absorbing
        # state with EXACTLY zero recovery gradient (measured: deployed
        # b(C) constant to 2.4e-5).  A 0.05 negative slope is strictly
        # increasing, so monotonicity is preserved and recovery gradients
        # never vanish.
        act = (lambda x: nn.leaky_relu(x, 0.05)) if softplus else nn.relu

        h = z0
        for dim in self.hidden_dims:
            h = dense(dim)(h)
            h = nn.BatchNorm(use_running_average=not training, momentum=0.9)(h)
            h = act(h)
        h = dense(1)(h)
        h = nn.sigmoid(h)

        bit_map = self.min_bits + (self.max_bits - self.min_bits) * h
        bit_map = bit_map.reshape(B, H, W)
        return _finalize_bit_map(
            bit_map, float(self.min_bits), float(self.max_bits),
            temperature, return_continuous,
        )


def enforce_monotonic_params(params) -> dict:
    """Eq.(18) |W| re-projection, applied to the bit-mapper's param subtree
    after every optimizer step (reference bit_allocation.py:186-197 and
    train.py:641).  Pure params -> params: takes the absolute value of Dense
    kernels and BatchNorm scales; biases untouched."""

    def project(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "kernel" in names or "scale" in names:
            return jnp.abs(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(project, params)


def get_bit_statistics(bit_map: jnp.ndarray, min_bits: int = 2, max_bits: int = 8) -> dict:
    """Bit-allocation statistics incl. an integer-bit histogram
    (reference bit_allocation.py:282-303)."""
    n_bins = int(max_bits - min_bits + 1)
    b = jnp.clip(jnp.round(bit_map), min_bits, max_bits).astype(jnp.int32)
    hist = jnp.zeros((n_bins,), jnp.int32).at[(b - min_bits).reshape(-1)].add(1)
    return {
        "mean": bit_map.mean(),
        "std": bit_map.std(),
        "min": bit_map.min(),
        "max": bit_map.max(),
        "histogram": hist,
    }
