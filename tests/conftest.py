"""Test configuration: force an 8-virtual-device CPU platform, so multi-chip
sharding tests run anywhere (the driver separately dry-runs the multichip
path; real-TPU benchmarking happens in bench.py).

This host's sitecustomize (/root/.axon_site) imports jax and registers the
TPU plugin at INTERPRETER START with JAX_PLATFORMS=axon baked into
jax.config — so the platform must be overridden via jax.config.update (env
edits are too late for JAX_PLATFORMS, but XLA_FLAGS is still read lazily at
first backend init, which hasn't happened yet)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: this host has a single CPU core, so XLA
# compiles dominate test time — cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.default_backend() == "cpu", "tests must run on the CPU platform"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def trained(tmp_path_factory):
    """Session-shared tiny end-to-end training run (4 epochs, all curriculum
    stages, synthetic 96px data) — consumed by the train smoke tests AND the
    analysis-script e2e tests (VERDICT r1 item 9)."""
    from mcaq_yolo_tpu.data import make_synthetic_dataset
    from mcaq_yolo_tpu.train import Trainer

    IMG = 96
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
