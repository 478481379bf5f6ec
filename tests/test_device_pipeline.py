"""Device-resident data pipeline vs the host (cv2/numpy) reference path.

The DevicePipeline must reproduce YOLODataset.get_item semantics: labels
bit-exactly (same numpy formulas), pixels exactly for pure block-copy ops
(clean images, mosaic, flip) and to interpolation/rounding tolerance for
resampled ops (affine: cv2 fixed-point bilinear vs exact f32; HSV: the
host path's intermediate uint8 rounding)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mcaq_yolo_tpu.data.dataset import (  # noqa: E402
    DataLoader,
    YOLODataset,
    load_dataset_yaml,
    make_synthetic_dataset_v2,
)
from mcaq_yolo_tpu.data.device_pipeline import (  # noqa: E402
    DevicePipeline,
    _affine_device,
    _hsv_jitter_device,
)

S = 64


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsv2")
    yaml_path = make_synthetic_dataset_v2(
        str(root), n_images=8, img_size=S, n_val=4, seed=3
    )
    data = load_dataset_yaml(yaml_path)
    return YOLODataset(data["train"], S, max_boxes=16, augment=False,
                       cache_images=True)


class _ScriptedRng:
    """Deterministic stand-in for np.random.Generator: replays scripted
    return values so a host augmentation draw can be forced."""

    def __init__(self, randoms=(), integers=(), uniforms=()):
        self._r = list(randoms)
        self._i = list(integers)
        self._u = list(uniforms)

    def random(self):
        return self._r.pop(0)

    def integers(self, lo, hi, size=None):
        v = self._i.pop(0)
        return np.asarray(v) if size is not None else v

    def uniform(self, lo, hi, size=None):
        v = self._u.pop(0)
        return np.asarray(v) if size is not None else v


def test_clean_bank_and_labels_match_host(ds):
    pipe = DevicePipeline(ds)
    host = DataLoader(ds, 4, shuffle=False, drop_last=True)
    dev = pipe.loader(4, shuffle=False, drop_last=True, augment=False)
    for hb, db in zip(host, dev):
        np.testing.assert_array_equal(hb["image"], np.asarray(db["image"]))
        np.testing.assert_array_equal(hb["gt_boxes"], db["gt_boxes"])
        np.testing.assert_array_equal(hb["gt_classes"], db["gt_classes"])
        np.testing.assert_array_equal(hb["gt_mask"], db["gt_mask"])
        assert hb["paths"] == db["paths"]


def test_mosaic_composite_exact_and_center_invariant(ds):
    """Device mosaic (fixed four-quarter composite) must equal the host
    mosaic EXACTLY for any random center — the center provably cancels for
    same-size letterboxed sources."""
    pipe = DevicePipeline(ds)
    idxs = [0, 3, 5, 1]
    ds.augment = True
    try:
        ds.hsv_p = 0.0  # isolate the mosaic geometry
        outs = []
        for cx, cy in [(S // 2, S // 2), (S, 3 * S // 2), (3 * S // 2, S)]:
            ds.rng = _ScriptedRng(randoms=[0.9] * 8,
                                  integers=[idxs[1:], cx, cy])
            img, boxes, classes = ds._mosaic(idxs[0])
            outs.append((img, boxes, classes))
    finally:
        ds.augment = False
        ds.hsv_p = 0.5
        ds.rng = np.random.default_rng(0)

    # center invariance of the host path itself
    for img, boxes, classes in outs[1:]:
        np.testing.assert_array_equal(outs[0][0], img)
        np.testing.assert_array_equal(outs[0][1], boxes)

    # device composite == host mosaic (pure block copy, no resampling)
    plan = (np.asarray([idxs], np.int32), np.ones(1, bool),
            np.zeros((1, 4), bool), np.ones((1, 4, 3), np.float32),
            np.ones(1, np.float32), np.zeros(1, np.float32),
            np.zeros(1, np.float32), np.zeros(1, bool))
    dev_img = np.asarray(pipe._augment(pipe.bank, *map(jnp.asarray, plan)))[0]
    np.testing.assert_array_equal(outs[0][0], dev_img)

    dev_boxes, dev_classes = pipe._mosaic_labels(idxs)
    np.testing.assert_allclose(outs[0][1], dev_boxes, atol=1e-5)
    np.testing.assert_array_equal(outs[0][2], dev_classes)


def test_affine_matches_cv2_warp(ds):
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    pipe = DevicePipeline(ds)
    img = np.asarray(pipe.bank[0])
    boxes, classes = pipe.boxes[0], pipe.classes[0]
    s, tx, ty = 1.3, 4.0, -5.0

    ds.augment = True
    try:
        ds.rng = _ScriptedRng(uniforms=[s - 1.0, tx / S, ty / S])
        h_img, h_boxes, _ = ds._affine(img.copy(), boxes.copy(), classes)
    finally:
        ds.augment = False
        ds.rng = np.random.default_rng(0)

    d_img = np.asarray(_affine_device(
        jnp.asarray(img, jnp.float32)[None],
        jnp.asarray([s], jnp.float32), jnp.asarray([tx], jnp.float32),
        jnp.asarray([ty], jnp.float32)))[0]
    d_img = np.clip(np.rint(d_img), 0, 255).astype(np.uint8)

    diff = np.abs(h_img.astype(np.int32) - d_img.astype(np.int32))
    assert diff.mean() < 1.0, f"mean abs diff {diff.mean():.2f}"
    assert np.quantile(diff, 0.99) <= 3, f"p99 diff {np.quantile(diff, .99)}"

    d_boxes, _ = pipe._affine_labels(boxes.copy(), classes, s, tx, ty)
    np.testing.assert_allclose(h_boxes, d_boxes, atol=1e-4)


def test_affine_downscale_border_fill(ds):
    """Shrinking reveals the border: device fill must match cv2's 114."""
    pipe = DevicePipeline(ds)
    img = np.asarray(pipe.bank[1])
    s = 0.5
    d_img = np.asarray(_affine_device(
        jnp.asarray(img, jnp.float32)[None],
        jnp.asarray([s], jnp.float32), jnp.zeros(1, jnp.float32),
        jnp.zeros(1, jnp.float32)))[0]
    corner = np.rint(d_img[:4, :4])
    np.testing.assert_array_equal(corner, np.full_like(corner, 114.0))


def test_hsv_matches_cv2(ds):
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    pipe = DevicePipeline(ds)
    img = np.asarray(pipe.bank[2])
    gains = np.asarray([1.01, 1.4, 0.8], np.float32)

    ds.augment = True
    try:
        ds.rng = _ScriptedRng(
            uniforms=[(gains - 1.0) / np.array([0.015, 0.7, 0.4])])
        h_img = ds._hsv_jitter(img.copy())
    finally:
        ds.augment = False
        ds.rng = np.random.default_rng(0)

    d_img = np.asarray(_hsv_jitter_device(
        jnp.asarray(img, jnp.float32), jnp.asarray(gains)))
    d_img = np.clip(np.rint(d_img), 0, 255).astype(np.uint8)

    diff = np.abs(h_img.astype(np.int32) - d_img.astype(np.int32))
    assert diff.mean() < 1.5, f"mean abs diff {diff.mean():.2f}"
    assert np.quantile(diff, 0.99) <= 6, f"p99 diff {np.quantile(diff, .99)}"


def test_augmented_loader_shapes_and_determinism(ds):
    pipe = DevicePipeline(ds)
    ds_aug_state = ds.augment
    ds.augment = True
    try:
        a = list(pipe.loader(4, shuffle=True, seed=11))
        b = list(pipe.loader(4, shuffle=True, seed=11))
    finally:
        ds.augment = ds_aug_state
    assert len(a) == 2
    for ba, bb in zip(a, b):
        assert ba["image"].shape == (4, S, S, 3)
        assert ba["image"].dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(ba["image"]),
                                      np.asarray(bb["image"]))
        np.testing.assert_array_equal(ba["gt_boxes"], bb["gt_boxes"])
        assert (ba["gt_boxes"] >= 0).all() and (ba["gt_boxes"] <= S).all()


def test_curriculum_subset_indices(ds):
    pipe = DevicePipeline(ds)
    sub = [1, 2, 5, 6]
    dl = pipe.loader(4, shuffle=False, indices=sub, augment=False)
    batch = next(iter(dl))
    expect = [ds.img_files[j] for j in sub]
    assert batch["paths"] == expect


@pytest.mark.slow
def test_trainer_end_to_end_with_device_pipeline(tmp_path):
    """Full Trainer run (all curriculum stages + eval + checkpoint) with
    data.device_pipeline on: the train/val loaders serve device-resident
    augmented batches and the run must behave like the host-loader path."""
    from mcaq_yolo_tpu.data import make_synthetic_dataset
    from mcaq_yolo_tpu.train import Trainer

    IMG = 96
    yaml_path = make_synthetic_dataset(str(tmp_path), n_images=8,
                                       img_size=IMG, n_classes=4)
    config = {
        "model": {"name": "yolov8n", "num_classes": 4, "teacher_path": None},
        "data": {"yaml_path": yaml_path, "img_size": IMG, "max_boxes": 8,
                 "device_pipeline": True},
        "epochs": 4,
        "batch_size": 4,
        "learning_rate": 1e-3,
        "quantization": {"min_bits": 2, "max_bits": 8, "target_bits": 4.0,
                         "grid_size": 8, "bit_mapping": "linear"},
        "curriculum": {"enabled": True, "warmup_epochs": 1,
                       "transition_epochs": 2, "initial_temperature": 10.0},
        "distillation": {"enabled": False},
        "training": {"map_interval": 1, "amp": False},
        "seed": 0,
        "output_dir": str(tmp_path / "outputs"),
    }
    trainer = Trainer(config)
    results = trainer.train()
    assert results["epochs"] == 4
    for h in trainer.history:
        assert np.isfinite(h["loss_total"])
    assert [h["stage"] for h in trainer.history] == [1, 1, 2, 3]
    ev = trainer.evaluate(3)
    assert 0.0 <= ev["map50"] <= 1.0
    assert (tmp_path / "outputs" / "last.ckpt").exists()


def test_chunked_bank_upload_equals_single(ds):
    """The chunked (64 MB default) bank upload must assemble the identical
    bank as a single-shot upload — pins the concatenate path that only
    triggers on banks larger than one chunk."""
    one = DevicePipeline(ds)  # bank fits one chunk at this size
    multi = DevicePipeline(ds, chunk_bytes=2 * ds.img_size * ds.img_size * 3)
    np.testing.assert_array_equal(np.asarray(one.bank),
                                  np.asarray(multi.bank))
    assert len(multi.bank) == len(ds)
