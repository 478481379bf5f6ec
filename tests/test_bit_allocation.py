"""Bit-mapper semantics + STE gradient-flow tests
(reference tests/test_smoke.py:74-112, 188-211)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcaq_yolo_tpu.core.bit_allocation import (
    ComplexityToBitMappingNetwork,
    LinearBitMapper,
    enforce_monotonic_params,
    get_bit_statistics,
    linear_bit_map,
)


def _mlp_and_vars(seed=0):
    mapper = ComplexityToBitMappingNetwork(min_bits=2, max_bits=8)
    c = jnp.asarray(np.random.default_rng(seed).random((2, 8, 8), np.float32))
    variables = mapper.init(jax.random.PRNGKey(seed), c)
    return mapper, variables, c


def test_bit_mapper_range_and_temperature():
    """Output in [2,8]; alpha=10 saturates every tile at 8 bits."""
    mapper, variables, c = _mlp_and_vars()
    bits = mapper.apply(variables, c, 1.0)
    assert bits.shape == c.shape
    assert bool(jnp.all(bits >= 2.0)) and bool(jnp.all(bits <= 8.0))

    bits_hot = mapper.apply(variables, c, 10.0)
    np.testing.assert_allclose(np.asarray(bits_hot), 8.0)


def test_bit_mapper_gradient_through_clamp_and_round():
    """The straight-through clamp/round must not be gradient-dead even when
    the whole map saturates at bmax (alpha_t = 10)."""
    mapper, variables, c = _mlp_and_vars()

    def loss(params):
        bits = mapper.apply({**variables, "params": params}, c, 10.0)
        return jnp.mean((bits - 4.0) ** 2)

    grads = jax.grad(loss)(variables["params"])
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0.0


def test_monotonicity_projection():
    mapper, variables, c = _mlp_and_vars()
    # poison some weights negative, then re-project
    params = jax.tree.map(lambda p: -jnp.abs(p) if p.ndim == 2 else p, variables["params"])
    projected = enforce_monotonic_params(params)
    for leaf in jax.tree_util.tree_leaves(projected):
        if leaf.ndim == 2:
            assert bool(jnp.all(leaf >= 0.0))


def test_monotone_response():
    """With |W| weights and monotone features, higher C must not get fewer
    bits (Eq.18's purpose)."""
    mapper, variables, c0 = _mlp_and_vars()
    variables = {**variables, "params": enforce_monotonic_params(variables["params"])}
    cs = jnp.linspace(0.0, 1.0, 16).reshape(1, 4, 4)
    bits = mapper.apply(variables, cs, 1.0, True)  # continuous
    flat = np.asarray(bits).reshape(-1)
    assert np.all(np.diff(flat) >= -1e-5)


def test_linear_bit_mapper_spatial_variance():
    """A spatially varied map must produce varied bits spanning the range."""
    c = jnp.asarray(np.linspace(0, 1, 64, dtype=np.float32).reshape(1, 8, 8))
    bits = linear_bit_map(c, 2, 8, temperature=1.0)
    assert float(bits.min()) == 2.0
    assert float(bits.max()) == 8.0
    assert float(bits.std()) > 0.5


def test_linear_bit_mapper_flat_map_absolute_fallback():
    """Flat C=0.5 -> uniform 5-bit via the absolute-complexity gate
    (reference test_smoke.py:199-211; guards the measured {2:399, 8:1}
    degenerate allocation)."""
    c = jnp.full((1, 8, 8), 0.5)
    bits = linear_bit_map(c, 2, 8, temperature=1.0)
    np.testing.assert_allclose(np.asarray(bits), 5.0)


def test_linear_mapper_module_interface():
    mapper = LinearBitMapper(min_bits=2, max_bits=8)
    c = jnp.asarray(np.random.default_rng(1).random((2, 8, 8), np.float32))
    variables = mapper.init(jax.random.PRNGKey(0), c)
    bits = mapper.apply(variables, c, 1.0)
    assert bits.shape == c.shape


def test_get_bit_statistics():
    bits = jnp.asarray(np.array([[[2.0, 8.0], [5.0, 5.0]]], np.float32))
    stats = get_bit_statistics(bits)
    assert float(stats["mean"]) == 5.0
    hist = np.asarray(stats["histogram"])
    assert hist.sum() == 4
    assert hist[0] == 1 and hist[3] == 2 and hist[6] == 1
