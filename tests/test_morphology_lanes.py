"""Equivalence suite: tiles-in-lanes metric engine vs the row engine.

The lanes engine (`core/morphology_lanes.py`) re-lowers the per-tile
metric pipeline into a (G, t, t, 128-tiles-in-lanes) layout — shift-add
separable convs, shift-max morphology, sort-based per-tile Otsu.  Its
contract is OPERATOR-IDENTICAL output to the row engine's
metric_mode='tiled' path (same padding modes, same Otsu bin math), so the
whole suite asserts near-bitwise agreement (float-rounding tolerance
only).  Reference recipe both engines replicate:
reference core/morphology.py:457-509 (Canny), 550-573 (binarize),
575-739 (phi metrics).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mcaq_yolo_tpu.core import morphology as M
from mcaq_yolo_tpu.core import morphology_lanes as ml
from mcaq_yolo_tpu.core import image_ops as iops

# lane-engine equivalence sweep - excluded from the CI fast gate
pytestmark = pytest.mark.slow

TOL = 1e-5


def _unpack_tiles(x, n):
    """(G, t, t, L) -> (N, t, t) for intermediate-map comparisons."""
    G, t, _, L = x.shape
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(G * L, t, t)[:n]


@pytest.fixture(scope="module")
def gray():
    rng = np.random.default_rng(7)
    g = jnp.asarray(rng.random((2, 64, 64)), jnp.float32)
    return iops.normalize01(g)


def test_pack_unpack_roundtrip(gray):
    packed, n = ml.pack_tiles(gray, 8)
    tiles, ht, wt = M.extract_tiles(gray, 8)
    assert n == tiles.shape[0]
    np.testing.assert_array_equal(
        np.asarray(_unpack_tiles(packed, n)), np.asarray(tiles)
    )


def test_otsu_sort_matches_histogram(gray):
    """The sort+prefix-sum Otsu must match the 256-bin histogram argmax
    (same bin centers, same first-bin tie rule)."""
    tiles, _, _ = M.extract_tiles(gray, 8)
    packed, n = ml.pack_tiles(gray, 8)
    thr_rows = np.asarray(iops.otsu_threshold(tiles)).ravel()
    thr_lanes = np.asarray(
        ml.unpack_scalars(ml.otsu_threshold(packed)[:, 0, 0, :], n, 1, 1, n)
    ).ravel()
    np.testing.assert_allclose(thr_lanes, thr_rows, atol=1e-6)


def test_canny_and_binarize_bitwise(gray):
    tiles, _, _ = M.extract_tiles(gray, 8)
    packed, n = ml.pack_tiles(gray, 8)
    edge_r = np.asarray(M.canny_cv2compat(tiles, pad_mode="edge"))
    edge_l = np.asarray(_unpack_tiles(ml.canny_cv2compat(packed), n))
    np.testing.assert_array_equal(edge_l, edge_r)
    bin_r = np.asarray(M.adaptive_binarize(tiles))
    bin_l = np.asarray(_unpack_tiles(ml.adaptive_binarize(packed), n))
    np.testing.assert_array_equal(bin_l, bin_r)


@pytest.mark.parametrize("canny", ["cv2compat", "legacy"])
@pytest.mark.parametrize("binarize", ["adaptive", "otsu"])
def test_phi_equivalence(canny, binarize):
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.standard_normal((2, 64, 64, 8)), jnp.float32)
    phi_r, det_r = M.compute_phi_tiles(
        feats, canny_impl=canny, binarize_impl=binarize, tile_engine="rows"
    )
    phi_l, det_l = M.compute_phi_tiles(
        feats, canny_impl=canny, binarize_impl=binarize, tile_engine="lanes"
    )
    np.testing.assert_allclose(np.asarray(phi_l), np.asarray(phi_r), atol=TOL)
    for k in det_r:
        np.testing.assert_allclose(
            np.asarray(det_l[k]), np.asarray(det_r[k]), atol=TOL, err_msg=k
        )


@pytest.mark.parametrize("hw", [(40, 40), (20, 20), (160, 160)])
def test_phi_equivalence_scales(hw):
    """Non-pow2-divisible and P4/P5/P2-like geometries (tile 4..16)."""
    rng = np.random.default_rng(hw[0])
    feats = jnp.asarray(rng.standard_normal((1, hw[0], hw[1], 4)), jnp.float32)
    phi_r, _ = M.compute_phi_tiles(feats, tile_engine="rows")
    phi_l, _ = M.compute_phi_tiles(feats, tile_engine="lanes")
    np.testing.assert_allclose(np.asarray(phi_l), np.asarray(phi_r), atol=TOL)


def test_structured_input_exercises_euler_paths():
    """Blobs touching tile borders — the case where the per-tile Euler
    count must include the bottom/right window row (exact all-windows
    Gray count, both engines).

    Structured images produce exactly-symmetric gradients, so the Canny
    NMS `mag >= shifted_mag` comparisons sit on EXACT ties — where any
    two conv lowerings (shift-add vs 2D conv; CPU vs TPU) can flip
    single pixels on last-ulp magnitude differences.  The contract is
    therefore: identical away from ties, and at most a few tie pixels
    per tile different (phi4 = edge density moves by k/t^2)."""
    img = np.zeros((1, 64, 64), np.float32)
    img[0, 5:8, 5:8] = 1.0      # blob touching tile (0,0)'s right/bottom border
    img[0, 16:20, 16:20] = 1.0  # interior blob in tile (2,2)
    img[0, 30:34, 8:16] = 1.0   # blob spanning a full tile width
    img[0, 41:43, 41:43] = 1.0  # multiple blobs in tile (5,5) -> K=3
    img[0, 44:46, 44:46] = 1.0
    img[0, 41:42, 45:47] = 1.0
    feats = jnp.asarray(img)[..., None]
    phi_r, det_r = M.compute_phi_tiles(feats, tile_engine="rows")
    phi_l, det_l = M.compute_phi_tiles(feats, tile_engine="lanes")

    # Euler K itself: exact all-windows count, identical across engines
    gray = iops.normalize01(jnp.asarray(img))
    tiles, _, _ = M.extract_tiles(gray, 8)
    packed, n = ml.pack_tiles(gray, 8)
    mask = (tiles > 0.5).astype(jnp.float32)
    K_r = np.asarray(
        M.euler_components_tiles(mask, 8, all_windows=True)
    ).ravel()
    K_l = np.asarray(ml.euler_components(
        (packed > 0.5).astype(jnp.float32))).ravel()[:n]
    np.testing.assert_array_equal(K_l, K_r)
    assert K_r.max() >= 3.0  # the multi-blob tile is actually counted
    # metrics not derived from tie-sensitive NMS edges agree tightly
    for k in ("texture", "gradient", "contour"):
        np.testing.assert_allclose(
            np.asarray(det_l[k]), np.asarray(det_r[k]), atol=TOL, err_msg=k
        )
    # edge-derived metrics: a tie flip on a STRONG pixel re-gates the weak
    # chain hanging off it through hysteresis, so one tie can move several
    # edge pixels in a tile (observed: 8/64 on this input)
    np.testing.assert_allclose(
        np.asarray(det_l["edge"]), np.asarray(det_r["edge"]), atol=10.5 / 64
    )
    np.testing.assert_allclose(
        np.asarray(det_l["fractal"]), np.asarray(det_r["fractal"]), atol=0.2
    )


def test_fractal_box_counts_exact():
    """Dyadic shift-max coarsening == max_pool box counting, per scale."""
    rng = np.random.default_rng(0)
    edge = jnp.asarray((rng.random((4, 8, 8)) > 0.7), jnp.float32)
    packed, n = ml.pack_tiles(edge, 8)
    f_r = np.asarray(M.fractal_dimension_tiles(edge, 8)).ravel()
    f_l = np.asarray(ml.fractal_dimension(packed, 8)).ravel()[:n]
    np.testing.assert_allclose(f_l, f_r, atol=1e-6)
