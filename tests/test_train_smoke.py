"""End-to-end training smoke test: synthetic dataset -> 3-epoch Trainer run
across all curriculum stages -> checkpoint -> Predictor inference -> resume.

Mirrors the reference's integration-test role (reference
test_smoke.py:173-185 + the 1-epoch coco8 smoke run documented in its
README).  Shapes chosen small; the jit compile is cached persistently so
repeat runs are fast."""

import json
from pathlib import Path

import numpy as np
import pytest

from mcaq_yolo_tpu.data import make_synthetic_dataset
from mcaq_yolo_tpu.train import Trainer

IMG = 96


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_smoke")
    yaml_path = make_synthetic_dataset(str(root), n_images=8, img_size=IMG,
                                       n_classes=4)
    config = {
        "model": {"name": "yolov8n", "num_classes": 4, "teacher_path": None},
        "data": {"yaml_path": yaml_path, "img_size": IMG, "max_boxes": 8},
        "epochs": 4,  # stages 1,1,2,3 (epoch <= warmup stays Stage 1)
        "batch_size": 4,
        "learning_rate": 1e-3,
        "quantization": {"min_bits": 2, "max_bits": 8, "target_bits": 4.0,
                         "grid_size": 8, "bit_mapping": "linear"},
        "curriculum": {"enabled": True, "warmup_epochs": 1,
                       "transition_epochs": 2, "initial_temperature": 10.0},
        "distillation": {"enabled": False},
        "training": {"map_interval": 1, "amp": False},
        "seed": 0,
        "output_dir": str(root / "outputs"),
    }
    trainer = Trainer(config)
    results = trainer.train()
    return trainer, results, config


def test_training_runs_all_stages(trained):
    trainer, results, config = trained
    assert results["epochs"] == 4
    stages = [h["stage"] for h in trainer.history]
    assert stages == [1, 1, 2, 3]
    # every epoch produced finite losses
    for h in trainer.history:
        assert np.isfinite(h["loss_total"])
    # stage 1 is the high-precision warm-up (quantize off)
    assert trainer.history[0]["quantize"] == 0.0
    assert trainer.history[3]["quantize"] == 1.0
    # temperature anneals downward
    temps = [h["temperature"] for h in trainer.history]
    assert temps[0] > temps[-1]


def test_checkpoints_written(trained):
    trainer, _, config = trained
    out = Path(config["output_dir"])
    assert (out / "last.ckpt").exists()
    assert (out / "last.ckpt.json").exists()
    assert (out / "history.json").exists()
    meta = json.loads((out / "last.ckpt.json").read_text())
    assert meta["variant"] == "yolov8n"
    # stage 3 was reached and mAP evaluated -> best.ckpt written
    assert (out / "best.ckpt").exists()


def test_predictor_on_checkpoint(trained):
    trainer, _, config = trained
    from mcaq_yolo_tpu.inference import Predictor

    ckpt = str(Path(config["output_dir"]) / "last.ckpt")
    predictor = Predictor(ckpt, num_classes=4, variant="yolov8n",
                          img_size=IMG, warmup=False,
                          bit_mapping="linear")
    img = (np.random.default_rng(0).random((IMG, IMG, 3)) * 255).astype(np.uint8)
    out = predictor.predict(img)
    assert "detections" in out
    assert 2.0 <= out["avg_bits"] <= 8.0
    assert out["complexity_map"].ndim == 2


def test_resume_roundtrip(trained):
    """True resume (params + EMA stats + optimizer state) — beyond the
    reference's weights-only checkpoints (SURVEY.md §5)."""
    trainer, _, config = trained
    import jax

    step_before = int(jax.device_get(trainer.state.step))
    trainer.load_checkpoint(str(Path(config["output_dir"]) / "last.ckpt"))
    assert int(jax.device_get(trainer.state.step)) == step_before
