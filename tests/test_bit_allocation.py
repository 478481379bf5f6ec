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
    mapper = ComplexityToBitMappingNetwork(min_bits=2, max_bits=8, monotone_param="abs")
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


def _softplus_mlp_and_vars(seed=0):
    mapper = ComplexityToBitMappingNetwork(min_bits=2, max_bits=8,
                                           monotone_param="softplus")
    c = jnp.asarray(np.random.default_rng(seed).random((2, 8, 8), np.float32))
    variables = mapper.init(jax.random.PRNGKey(seed), c)
    return mapper, variables, c


def test_softplus_mapper_monotone_and_varying():
    """softplus(theta) kernels are positive by construction: the transfer
    curve must be monotone AND non-constant WITHOUT any projection step."""
    mapper, variables, _ = _softplus_mlp_and_vars()
    cs = jnp.linspace(0.0, 1.0, 16).reshape(1, 4, 4)
    bits = mapper.apply(variables, cs, 1.0, True)  # continuous
    flat = np.asarray(bits).reshape(-1)
    assert np.all(np.diff(flat) >= -1e-5)
    assert flat.max() - flat.min() > 1e-3  # not collapsed at init


def test_softplus_mapper_projection_is_noop_on_theta():
    """enforce_monotonic_params matches 'kernel'/'scale' names only; the
    softplus mapper's raw theta (which may be negative) must pass through
    untouched — projecting it would double-apply the positivity."""
    mapper, variables, c = _softplus_mlp_and_vars()
    projected = enforce_monotonic_params(variables["params"])
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(variables["params"])[0],
        jax.tree_util.tree_flatten_with_path(projected)[0],
    ):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in pa]
        if "theta" in names:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert float(np.asarray(a).min()) < 0.0  # theta IS signed
        if "scale" in names:  # BatchNorm scales still projected
            assert bool(jnp.all(b >= 0.0))


def test_softplus_mapper_no_zero_trap_dynamics():
    """The abs-projection failure mode: a persistent downward Lbit
    pressure during the temperature-saturated curriculum window drives the
    mapper constant (measured: deployed b(C) spread 2.4e-5 at the 4.0-bit
    target).  Modeled with TRAIN-mode BatchNorm (the real dynamics — BN
    makes hidden-kernel scale a free parameter, so the last un-normalized
    layer carries the gain), the softplus mapper must regain a
    non-trivial monotone spread after a recovery phase."""
    import optax

    mapper, variables, _ = _softplus_mlp_and_vars(seed=1)
    params, bstats = variables["params"], variables["batch_stats"]
    cs = jnp.linspace(0.0, 1.0, 32).reshape(1, 1, 32)

    opt = optax.adam(5e-3)
    state = opt.init(params)

    def fwd(p, bs):
        return mapper.apply({"params": p, "batch_stats": bs}, cs, 1.0, True,
                            training=True, mutable=["batch_stats"])

    def down_loss(p, bs):  # Lbit-style: push mean output to bmin
        bits, upd = fwd(p, bs)
        return jnp.abs(bits.mean() - 2.0), upd["batch_stats"]

    def spread_loss(p, bs):  # detection-style counter-pressure: want spread
        bits, upd = fwd(p, bs)
        loss = (-(bits[..., -1] - bits[..., 0]).mean()
                + jnp.abs(bits.mean() - 4.0))
        return loss, upd["batch_stats"]

    @jax.jit
    def step(p, s, bs, phase):
        def obj(q):
            ld, lu = down_loss(q, bs)
            ls, su = spread_loss(q, bs)
            return (jnp.where(phase, ls, ld),
                    jax.tree.map(lambda a, b: jnp.where(phase, b, a), lu, su))
        (_, new_bs), g = jax.value_and_grad(obj, has_aux=True)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, new_bs

    for _ in range(300):  # collapse pressure
        params, state, bstats = step(params, state, bstats, jnp.asarray(False))
    for _ in range(300):  # recovery pressure
        params, state, bstats = step(params, state, bstats, jnp.asarray(True))

    bits = mapper.apply({"params": params, "batch_stats": bstats},
                        cs, 1.0, True)  # eval mode, running stats
    flat = np.asarray(bits).reshape(-1)
    assert flat.max() - flat.min() > 0.1, "softplus mapper failed to recover spread"
    assert np.all(np.diff(flat) >= -1e-4), "monotonicity violated"


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


def test_softplus_is_the_default_everywhere():
    """r4 default flip (VERDICT r3 item 2 contingency): the class default,
    the model default, and the shipped config all resolve to 'softplus';
    'abs' stays the documented reference-parity opt-in (the parity tests
    pin it explicitly)."""
    from pathlib import Path

    import yaml

    from mcaq_yolo_tpu.models import MCAQYOLO

    assert ComplexityToBitMappingNetwork().monotone_param == "softplus"
    assert MCAQYOLO().monotone_param == "softplus"
    cfg = yaml.safe_load(
        (Path(__file__).parent.parent / "configs" / "train_config.yaml")
        .read_text())
    assert cfg["quantization"]["monotone_param"] == "softplus"


def test_constant_bit_mapper():
    """Matched-budget PTQ control (quality arm M): constant map, rounded in
    deployment mode, clamped to [min, max]."""
    import jax
    from mcaq_yolo_tpu.core.bit_allocation import ConstantBitMapper

    c = jnp.linspace(0, 1, 64).reshape(1, 8, 8)
    m = ConstantBitMapper(bits=5.4)
    out = m.apply({}, c, 1.0, return_continuous=False)
    assert out.shape == c.shape
    assert jnp.all(out == 5.0)
    cont = m.apply({}, c, 1.0, return_continuous=True)
    assert jnp.all(jnp.abs(cont - 5.4) < 1e-6)
    lo = ConstantBitMapper(bits=1.0, min_bits=2, max_bits=8)
    assert jnp.all(lo.apply({}, c, 1.0) == 2.0)
