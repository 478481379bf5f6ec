"""Straight-through estimators (the 'STE triple' of the reference:
quantize round, bit clamp, bit round — reference quantization.py:69-118,
bit_allocation.py:272-279).  Implemented as x + stop_gradient(f(x) - x),
which keeps the backward pass an identity under jax.grad even when the
forward value is saturated."""

import jax.numpy as jnp
from jax import lax


def ste(x: jnp.ndarray, fx: jnp.ndarray) -> jnp.ndarray:
    """Forward = fx, backward = identity w.r.t. x."""
    return x + lax.stop_gradient(fx - x)


def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    return ste(x, jnp.round(x))


def ste_clamp(x: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    return ste(x, jnp.clip(x, lo, hi))
