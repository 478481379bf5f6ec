"""Shape/range/gradient tests for the morphology metric pipeline, mirroring
the reference test contract (reference tests/test_smoke.py:33-67, 214-223)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcaq_yolo_tpu.core import image_ops as iops
from mcaq_yolo_tpu.core.morphology import (
    MorphologicalComplexityAnalyzer,
    compute_phi_tiles,
    euler_components_tiles,
    bilateral_filter,
)


@pytest.mark.parametrize("H", [160, 80, 40, 20])
def test_phi_tiles_shapes(H):
    """(B, ht, wt, 8) for typical feature-map sizes; pow2 tile >= 4; phi in [0,1]."""
    x = jnp.asarray(np.random.default_rng(0).random((2, H, H, 3), np.float32))
    phi, detailed = compute_phi_tiles(x, grid_size=8)
    tile = iops.tile_size_for(H, 8)
    assert tile >= 4 and (tile & (tile - 1)) == 0
    ht = H // tile
    assert phi.shape == (2, ht, ht, 8)
    assert bool(jnp.all(phi >= 0.0)) and bool(jnp.all(phi <= 1.0))
    for v in detailed.values():
        assert v.shape == (2, ht, ht)


def test_tile_size():
    assert iops.tile_size_for(640, 8) == 64
    assert iops.tile_size_for(80, 8) == 8
    assert iops.tile_size_for(40, 8) == 4
    assert iops.tile_size_for(20, 8) == 4  # floor of 4


def test_analyzer_forward_range_and_grad():
    """Complexity in [0,1]; gradients reach the complexity MLP but NOT phi."""
    analyzer = MorphologicalComplexityAnalyzer(grid_size=8)
    x = jnp.asarray(np.random.default_rng(1).random((2, 64, 64, 8), np.float32))
    variables = analyzer.init(jax.random.PRNGKey(0), x)
    c = analyzer.apply(variables, x)
    assert c.shape == (2, 8, 8)
    assert bool(jnp.all(c >= 0.0)) and bool(jnp.all(c <= 1.0))

    def loss(params):
        out = analyzer.apply({**variables, "params": params}, x)
        return jnp.sum(out**2)

    grads = jax.grad(loss)(variables["params"])
    gnorm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)
    )
    assert gnorm > 0.0, "gradients must reach the complexity MLP"


def test_score_image_deterministic():
    analyzer = MorphologicalComplexityAnalyzer(grid_size=8)
    x = jnp.asarray(np.random.default_rng(2).random((1, 64, 64, 3), np.float32))
    variables = analyzer.init(jax.random.PRNGKey(0), x)
    s1 = analyzer.apply(variables, x, method="score_image")
    s2 = analyzer.apply(variables, x, method="score_image")
    assert s1.shape == (1,)
    assert float(jnp.abs(s1 - s2).max()) == 0.0
    assert 0.0 <= float(s1[0]) <= 1.0


def test_contour_euler_component_count():
    """Euler-number K on a synthetic mask with known components
    (reference test_smoke.py:214-223)."""
    m = np.zeros((1, 16, 16), np.float32)
    # two separate blobs in tile (0,0) of a 16x16 single-tile image
    m[0, 2:5, 2:5] = 1.0
    m[0, 9:12, 9:12] = 1.0
    K = euler_components_tiles(jnp.asarray(m), tile=16)
    assert K.shape == (1, 1, 1)
    assert float(K[0, 0, 0]) == 2.0


def test_bilateral_filter_smooths_but_keeps_edges():
    """Constant map unchanged; a sharp step is not blurred into mush."""
    const = jnp.full((1, 10, 10), 0.5)
    out = bilateral_filter(const)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)

    step = jnp.concatenate(
        [jnp.zeros((1, 10, 5)), jnp.ones((1, 10, 5))], axis=2
    )
    out = bilateral_filter(step)
    # range kernel (sigma_r=0.1) suppresses cross-edge mixing
    assert float(out[0, 5, 0]) < 0.1
    assert float(out[0, 5, 9]) > 0.9


def test_otsu_threshold_bimodal():
    """Otsu separates a clean bimodal distribution."""
    rng = np.random.default_rng(3)
    lo = rng.normal(0.2, 0.02, (1, 32, 32)).clip(0, 1)
    hi = rng.normal(0.8, 0.02, (1, 32, 32)).clip(0, 1)
    x = np.concatenate([lo[:, :16], hi[:, :16]], axis=1).astype(np.float32)
    thr = iops.otsu_threshold(jnp.asarray(x))
    # Between-class variance is flat across the empty gap between modes;
    # argmax returns the first index of the plateau (just above the low
    # mode) — same tie-breaking as the reference's torch.argmax.  The
    # threshold must separate the two modes.
    assert 0.25 < float(thr[0, 0, 0]) < 0.75


def test_phi_downsample_contract(rng):
    """Opt-in morphology downsample (MFU lever): identical phi SHAPES and
    ranges, strongly correlated values at 2x, auto-degrade at tile=4."""
    import numpy as np
    import jax.numpy as jnp
    from mcaq_yolo_tpu.core.morphology import compute_phi_tiles

    # textured + flat regions so correlation is meaningful
    x = rng.random((2, 64, 64, 8), dtype=np.float32)
    x[:, :32] = 0.5  # flat half
    phi_full, _ = compute_phi_tiles(jnp.asarray(x), grid_size=8)
    phi_ds, _ = compute_phi_tiles(jnp.asarray(x), grid_size=8, downsample=2)
    assert phi_ds.shape == phi_full.shape
    a = np.asarray(phi_full).reshape(-1)
    b = np.asarray(phi_ds).reshape(-1)
    assert np.all(b >= -1e-6) and np.all(b <= 1 + 1e-6)
    r = np.corrcoef(a, b)[0, 1]
    assert r > 0.7, f"downsampled phi decorrelated: r={r:.3f}"

    # tile=4 map (P5-like): downsample must self-disable, not crash
    small = rng.random((1, 20, 20, 8), dtype=np.float32)
    p1, _ = compute_phi_tiles(jnp.asarray(small), grid_size=8)
    p2, _ = compute_phi_tiles(jnp.asarray(small), grid_size=8, downsample=2)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=0)
