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

# multi-epoch end-to-end training runs - excluded from the CI fast gate
pytestmark = pytest.mark.slow

IMG = 96


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


def test_curriculum_wiring_from_config(trained):
    """quantization.target_bits and the lambda1 saturation gate must reach
    the scheduler (the target was silently pinned to 4.0 before r4; the
    gate must be on by default and respect curriculum.lambda_bit_gate)."""
    trainer, _, config = trained
    cur = trainer.curriculum
    assert cur.target_bits == config["quantization"]["target_bits"]
    assert cur.min_bits == config["quantization"]["min_bits"]
    assert cur.max_bits == config["quantization"]["max_bits"]
    assert cur.lambda_bit_gate is True  # default ON
    # opt-out restores the reference-exact anneal
    from mcaq_yolo_tpu.core.curriculum import CurriculumScheduler

    ref = CurriculumScheduler(lambda_bit_gate=False)
    assert ref.get_loss_weights(0)["bit_budget"] > 0.0


def test_checkpoints_written(trained):
    trainer, _, config = trained
    out = Path(config["output_dir"])
    assert (out / "last.ckpt").exists()
    assert (out / "last.ckpt.json").exists()
    assert (out / "history.json").exists()
    meta = json.loads((out / "last.ckpt.json").read_text())
    assert meta["variant"] == "yolov8n"
    # meta must carry RESOLVED model-defining values, not just the raw
    # user config: this fixture's yaml omits monotone_param and
    # morphology entirely — if meta echoed the raw config, a Predictor
    # built after a default flip would silently rebuild the wrong mapper
    # topology and keep freshly-initialized weights for it.
    q = meta["config"]["quantization"]
    assert q["monotone_param"] == trainer.model.monotone_param
    assert q["bit_mapping"] == "linear"
    assert meta["config"]["morphology"]["tile_engine"] == (
        trainer.model.morph_tile_engine)
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


def test_missing_teacher_fails_fast(trained, tmp_path):
    """KD enabled without a teacher checkpoint must error at construction,
    not silently distill from random weights (VERDICT r1 weak-4; the
    reference hard-requires a teacher, reference train.py:83-94)."""
    _, _, config = trained
    bad = dict(config)
    bad["distillation"] = {"enabled": True}
    bad["model"] = dict(config["model"], teacher_path=str(tmp_path / "nope.ckpt"))
    bad["output_dir"] = str(tmp_path / "out")
    with pytest.raises(FileNotFoundError, match="teacher_path"):
        Trainer(bad)


def test_pool_saturation_warns_every_time(trained):
    """The headroom-contract warning must fire on EVERY saturation (and
    count them) — Python's default warnings filter would print only the
    first per call site, hiding repeat violations across a batch run."""
    import warnings as w

    trainer, _, config = trained
    from mcaq_yolo_tpu.inference import Predictor

    ckpt = str(Path(config["output_dir"]) / "last.ckpt")
    p = Predictor(ckpt, num_classes=4, variant="yolov8n", img_size=IMG,
                  warmup=False, bit_mapping="linear", pre_topk=8)
    assert p.pool_saturations == 0
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("default")  # the filter the fix must override
        p._check_pool_headroom(np.array([8]))
        p._check_pool_headroom(np.array([9]))
        p._check_pool_headroom(np.array([3]))  # below pool: no warning
    assert p.pool_saturations == 2
    assert len([r for r in rec if r.category is RuntimeWarning]) == 2


def test_predict_batch_matches_single(trained):
    """predict_batch is a true batched forward; per-image results must match
    the bs=1 path (VERDICT r1 weak-5)."""
    trainer, _, config = trained
    from mcaq_yolo_tpu.inference import Predictor

    ckpt = str(Path(config["output_dir"]) / "last.ckpt")
    predictor = Predictor(ckpt, num_classes=4, variant="yolov8n",
                          img_size=IMG, warmup=False, bit_mapping="linear")
    rng = np.random.default_rng(1)
    imgs = [(rng.random((IMG, IMG, 3)) * 255).astype(np.uint8)
            for _ in range(3)]
    batched = predictor.predict_batch(imgs, batch_size=2)  # ragged tail
    assert len(batched) == 3
    for im, rb in zip(imgs, batched):
        r1 = predictor.predict(im)
        assert len(r1["detections"]) == len(rb["detections"])
        for d1, db in zip(r1["detections"], rb["detections"]):
            np.testing.assert_allclose(d1["bbox"], db["bbox"], atol=1e-3)
            assert d1["class_id"] == db["class_id"]
        np.testing.assert_allclose(
            r1["bit_map"], rb["bit_map"], atol=1e-5
        )


def test_teacher_export_and_kd_init(trained, tmp_path):
    """export_teacher_from_ckpt produces a loadable FP32 teacher tree, and
    a KD Trainer constructs with it (fail-fast path satisfied)."""
    import numpy as np
    from flax import serialization

    from mcaq_yolo_tpu.train import export_teacher_from_ckpt

    trainer, _, config = trained
    ckpt = str(Path(config["output_dir"]) / "last.ckpt")
    tpath = export_teacher_from_ckpt(
        ckpt, str(tmp_path / "teacher.ckpt"), "yolov8n", 4, IMG)
    assert Path(tpath).exists()

    kd_cfg = dict(config)
    kd_cfg["model"] = dict(config["model"], teacher_path=tpath)
    kd_cfg["distillation"] = {"enabled": True}
    kd_cfg["epochs"] = 1
    kd_cfg["output_dir"] = str(tmp_path / "kd_out")
    kd_trainer = Trainer(kd_cfg)
    assert kd_trainer.teacher_vars is not None
    # teacher params match the exported detector weights
    import jax
    tv = jax.device_get(kd_trainer.teacher_vars)
    sv = jax.device_get(trainer.state.params)
    leaf_t = np.asarray(
        tv["params"]["backbone"]["ConvBnSiLU_0"]["Conv_0"]["kernel"])
    leaf_s = np.asarray(
        sv["backbone"]["ConvBnSiLU_0"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(leaf_t, leaf_s)


def test_trainer_fsdp_mode(tmp_path):
    """`training.parallel: fsdp` end-to-end: Trainer places the train state
    sharded across the mesh, a short run produces finite losses, and the
    checkpoint written from sharded arrays restores into a Predictor."""
    import jax

    from mcaq_yolo_tpu.inference import Predictor
    from mcaq_yolo_tpu.parallel.fsdp import shard_fraction

    yaml_path = make_synthetic_dataset(str(tmp_path), n_images=8,
                                       img_size=IMG, n_classes=4)
    config = {
        "model": {"name": "yolov8n", "num_classes": 4, "teacher_path": None},
        "data": {"yaml_path": yaml_path, "img_size": IMG, "max_boxes": 8},
        "epochs": 2,
        "batch_size": 8,  # mesh uses all 8 virtual devices
        "learning_rate": 1e-3,
        "quantization": {"min_bits": 2, "max_bits": 8, "target_bits": 4.0,
                         "grid_size": 8, "bit_mapping": "linear"},
        "curriculum": {"enabled": True, "warmup_epochs": 1,
                       "transition_epochs": 1, "initial_temperature": 10.0},
        "distillation": {"enabled": False},
        "training": {"map_interval": 1, "amp": False, "parallel": "fsdp"},
        "seed": 0,
        "output_dir": str(tmp_path / "outputs"),
    }
    trainer = Trainer(config)
    assert trainer.parallel_mode == "fsdp"
    # the bulk of the state must actually be sharded, not replicated
    assert shard_fraction(trainer.state.params, trainer.mesh) > 0.5
    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    assert any(not l.sharding.is_fully_replicated for l in leaves)

    results = trainer.train()
    for h in trainer.history:
        assert np.isfinite(h["loss_total"])
    # state stays sharded through jitted update steps
    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    assert any(not l.sharding.is_fully_replicated for l in leaves)

    ckpt = Path(config["output_dir"]) / "last.ckpt"
    assert ckpt.exists()
    pred = Predictor(str(ckpt), num_classes=4, variant="yolov8n",
                     img_size=IMG, bit_mapping="linear", warmup=False)
    out = pred.predict(np.zeros((IMG, IMG, 3), np.uint8))
    assert np.isfinite(out["avg_bits"])

    with pytest.raises(ValueError):
        Trainer({**config, "training": {"parallel": "zz"},
                 "output_dir": str(tmp_path / "o2")})


def test_bit_mapper_excluded_from_weight_decay():
    """The AdamW decay mask must mark every bit_mapper parameter False
    (excluded) and detector parameters True — guarding against the
    measured decay + |W|-projection collapse of the mapper MLP to a
    constant b(C) (see weight_decay_mask docstring)."""
    import jax
    import jax.numpy as jnp

    from mcaq_yolo_tpu.models import MCAQYOLO
    from mcaq_yolo_tpu.train import weight_decay_mask

    model = MCAQYOLO(variant="yolov8n", num_classes=4, bit_mapping="mlp")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           training=False)
    params = variables["params"]
    mask = weight_decay_mask(params)
    n_mapper = n_decayed = 0
    for path, marked in jax.tree_util.tree_flatten_with_path(mask)[0]:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "bit_mapper" in names:
            assert marked is False, names
            n_mapper += 1
        else:
            assert marked is True, names
            n_decayed += 1
    assert n_mapper > 0 and n_decayed > 0

    # reference-behavior switch: everything decays
    mask_ref = weight_decay_mask(params, decay_bit_mapper=True)
    assert all(m is True
               for _, m in jax.tree_util.tree_flatten_with_path(mask_ref)[0])


def test_predictor_mirrors_model_config_from_meta(trained, tmp_path):
    """Predictor must restore EVERY model-defining config key from the
    checkpoint meta (monotone_param, min/max bits, normalize_complexity,
    morphology engine/downsample) — a softplus or bits-capped checkpoint
    restored into the default template would silently produce wrong bit
    maps.  Explicit kwargs (deploy-time levers) must win over meta."""
    import shutil

    trainer, _, config = trained
    from mcaq_yolo_tpu.inference import Predictor

    src = Path(config["output_dir"]) / "last.ckpt"
    ckpt = tmp_path / "doctored.ckpt"
    shutil.copy(src, ckpt)
    meta = json.loads((Path(config["output_dir"]) / "last.ckpt.json")
                      .read_text())
    meta["config"]["quantization"].update(
        min_bits=3, max_bits=6, monotone_param="softplus",
        normalize_complexity=True, bit_mapping="mlp")
    meta["config"]["morphology"] = {"downsample": 2, "tile_engine": "rows"}
    (tmp_path / "doctored.ckpt.json").write_text(json.dumps(meta))

    p = Predictor(str(ckpt), warmup=False)
    m = p.model
    assert (m.min_bits, m.max_bits) == (3, 6)
    assert m.monotone_param == "softplus"
    assert m.normalize_complexity is True
    assert m.bit_mapping == "mlp"
    assert m.morph_downsample == 2
    assert m.morph_tile_engine == "rows"

    # explicit kwargs override meta (deploy-time lever contract)
    p2 = Predictor(str(ckpt), warmup=False, morph_downsample=1,
                   monotone_param="abs")
    assert p2.model.morph_downsample == 1
    assert p2.model.monotone_param == "abs"
    assert p2.model.min_bits == 3  # untouched keys still come from meta


def test_deploy_temperature_roundtrip(tmp_path):
    """The budget controller's bit_scale trim must survive the checkpoint
    round-trip: save_checkpoint writes it as deploy_temperature in meta,
    Predictor honors it, and the deployed bit maps actually scale (the
    QUALITY_r05 results evaluate at this trained trim — an untested break
    here would silently deploy every controller-trained model at 1.0)."""
    from mcaq_yolo_tpu.data import make_synthetic_dataset
    from mcaq_yolo_tpu.inference import Predictor

    yaml_path = make_synthetic_dataset(str(tmp_path), n_images=4,
                                       img_size=IMG, n_classes=4)
    config = {
        "model": {"name": "yolov8n", "num_classes": 4, "teacher_path": None},
        "data": {"yaml_path": yaml_path, "img_size": IMG, "max_boxes": 8},
        "epochs": 2, "batch_size": 2, "learning_rate": 1e-3,
        "quantization": {"min_bits": 2, "max_bits": 8, "target_bits": 4.0,
                         "grid_size": 8, "bit_mapping": "linear"},
        "curriculum": {"enabled": True, "warmup_epochs": 1,
                       "transition_epochs": 1, "budget_controller": True},
        "distillation": {"enabled": False},
        "training": {"map_interval": 10, "amp": False},
        "seed": 0,
        "output_dir": str(tmp_path / "out"),
    }
    from mcaq_yolo_tpu.train import Trainer

    trainer = Trainer(config)
    trainer.curriculum.bit_scale = 0.8  # as the controller would set it
    trainer.save_checkpoint("best.ckpt", epoch=0)

    pred = Predictor(str(tmp_path / "out" / "best.ckpt"), warmup=False)
    assert pred.deploy_temperature == pytest.approx(0.8)

    # the trim must actually scale the deployed allocation
    import jax
    import jax.numpy as jnp

    @jax.jit
    def bits_at(t):
        _, aux = pred.model.apply(
            pred.variables,
            jnp.zeros((1, IMG, IMG, 3), jnp.float32) + 0.5,
            temperature=jnp.float32(t), quantize=True, training=False)
        return aux["avg_bits"]

    b_deploy = float(bits_at(pred.deploy_temperature))
    b_unit = float(bits_at(1.0))
    assert b_deploy < b_unit
