"""Data-parallel execution tests on the 8-virtual-device CPU mesh
(conftest forces XLA_FLAGS=--xla_force_host_platform_device_count=8) — the
pmap/pjit coverage the reference lacks entirely (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcaq_yolo_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


def test_mesh_and_sharding():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8}

    batch = {"image": jnp.ones((8, 16, 16, 3)), "gt_mask": jnp.ones((8, 4), bool)}
    sharded = shard_batch(mesh, batch)
    # leading axis split 8 ways: each shard holds one image
    assert len(sharded["image"].sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in sharded["image"].addressable_shards}
    assert shard_shapes == {(1, 16, 16, 3)}

    params = {"w": jnp.ones((4, 4))}
    rep = replicate(mesh, params)
    assert len(rep["w"].sharding.device_set) == 8
    assert all(s.data.shape == (4, 4) for s in rep["w"].addressable_shards)


def test_dp_gradient_allreduce_semantics():
    """A jitted loss+grad over a sharded batch must equal the single-device
    result (XLA inserts the all-reduce)."""
    mesh = make_mesh(8)
    w = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)).astype(np.float32))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(16, 8)).astype(np.float32))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_single = jax.grad(loss)(w, x)

    xs = jax.device_put(x, batch_sharding(mesh))
    wr = replicate(mesh, w)
    g_dp = jax.jit(jax.grad(loss))(wr, xs)
    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_single), rtol=1e-5)


def test_fsdp_spec_rule():
    """Leaf-wise sharding rule: largest divisible dim, last wins ties,
    small leaves replicate."""
    from jax.sharding import PartitionSpec as P

    from mcaq_yolo_tpu.parallel.fsdp import fsdp_spec

    # HWIO conv kernel: O (=64) and I (=64) tie -> LAST dim (O) sharded
    assert fsdp_spec((3, 3, 64, 64), 8) == P(None, None, None, "data")
    # I=128 larger than O=64 -> I sharded
    assert fsdp_spec((3, 3, 128, 64), 8) == P(None, None, "data", None)
    # small leaf (BN scale) replicates despite divisibility
    assert fsdp_spec((64,), 8) == P()
    # large but indivisible dims replicate
    assert fsdp_spec((3, 3, 129, 67), 8, min_size=0) == P()
    # single-device mesh replicates everything
    assert fsdp_spec((3, 3, 128, 128), 1) == P()


def test_fsdp_grad_step_matches_single_device():
    """A jitted grad step with the WEIGHT sharded across the mesh (FSDP)
    must match the single-device result (GSPMD inserts the all-gather) and
    must keep the updated weight sharded (ZeRO-3 semantics: the elementwise
    update stays in the sharded layout)."""
    from mcaq_yolo_tpu.parallel.fsdp import fsdp_shard, fsdp_shardings

    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    def step(w, x):
        return w - 0.1 * jax.grad(loss)(w, x)

    w_single = step(w, x)

    ws = fsdp_shard(w, mesh, min_size=0)
    assert not ws.sharding.is_fully_replicated
    xs = jax.device_put(x, batch_sharding(mesh))
    w_new = jax.jit(step)(ws, xs)
    np.testing.assert_allclose(
        np.asarray(w_new), np.asarray(w_single), rtol=1e-5)
    # the update must NOT silently gather: output stays sharded
    assert not w_new.sharding.is_fully_replicated


@pytest.mark.slow  # full-model init, ~100 s
def test_fsdp_shard_fraction_on_model_params():
    """The rule must shard the bulk of a real model's parameters (the
    memory-capacity contract) while replicating the small leaves."""
    from mcaq_yolo_tpu.models import MCAQYOLO
    from mcaq_yolo_tpu.parallel.fsdp import fsdp_shard, shard_fraction

    mesh = make_mesh(8)
    model = MCAQYOLO(variant="yolov8n", num_classes=4, bit_mapping="mlp",
                     grid_size=4)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=False)
    frac = shard_fraction(variables["params"], mesh)
    assert frac > 0.7, f"only {frac:.0%} of param elements sharded"

    placed = fsdp_shard(variables["params"], mesh)
    leaves = jax.tree_util.tree_leaves(placed)
    shard_counts = [len(l.sharding.device_set) for l in leaves]
    assert max(shard_counts) == 8  # something actually landed sharded


@pytest.mark.slow
def test_full_dp_train_step_8dev():
    """The driver's dryrun path inside the suite: full MCAQ train step (KD +
    fractional-bit STE + Eq.20 + AdamW + Eq.18) over the 8-device mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # asserts finite loss internally


@pytest.mark.slow
def test_data_parallel_predictor(tmp_path):
    """Opt-in DP serving: Predictor(data_parallel=True) shards predict_batch
    chunks across the 8-device mesh and returns the same result contract as
    the single-device path (incl. a ragged tail smaller than the mesh)."""
    from flax import serialization

    from mcaq_yolo_tpu.inference import Predictor
    from mcaq_yolo_tpu.models import MCAQYOLO

    model = MCAQYOLO(variant="yolov8n", num_classes=4, bit_mapping="linear",
                     grid_size=4)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=False)
    ckpt = tmp_path / "dp.ckpt"
    ckpt.write_bytes(serialization.msgpack_serialize(
        {k: jax.device_get(v) for k, v in variables.items()}))

    rng = np.random.default_rng(0)
    images = [rng.integers(0, 255, (64, 64, 3), np.uint8) for _ in range(11)]

    dp = Predictor(str(ckpt), num_classes=4, variant="yolov8n", img_size=64,
                   bit_mapping="linear", grid_size=4, warmup=False,
                   data_parallel=True)
    assert dp.mesh is not None and dp.mesh.devices.size == 8
    res = dp.predict_batch(images, batch_size=6)  # rounds up to 8, tail 3
    assert len(res) == 11
    for r in res:
        assert "detections" in r and np.isfinite(r["avg_bits"])

    # parity vs the single-device program on one chunk
    sd = Predictor(str(ckpt), num_classes=4, variant="yolov8n", img_size=64,
                   bit_mapping="linear", grid_size=4, warmup=False)
    res_sd = sd.predict_batch(images[:8], batch_size=8)
    for a, b in zip(res[:8], res_sd):
        assert len(a["detections"]) == len(b["detections"])
        for da, db in zip(a["detections"], b["detections"]):
            assert da["class_id"] == db["class_id"]
            np.testing.assert_allclose(da["confidence"], db["confidence"],
                                       rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_fsdp_checkpoint_resume_bit_identical(tmp_path):
    """FSDP resume correctness (VERDICT r4 item 8): save_checkpoint /
    load_checkpoint round-trips SHARDED state — params, EMA quantizer
    stats, and optimizer state restore bit-identically onto the
    8-virtual-device mesh, and the restored leaves are actually sharded."""
    from mcaq_yolo_tpu.data import make_synthetic_dataset
    from mcaq_yolo_tpu.train import Trainer

    IMG = 64
    yaml_path = make_synthetic_dataset(str(tmp_path), n_images=8,
                                       img_size=IMG, n_classes=4)
    config = {
        "model": {"name": "yolov8n", "num_classes": 4, "teacher_path": None},
        "data": {"yaml_path": yaml_path, "img_size": IMG, "max_boxes": 8},
        "epochs": 1,
        "batch_size": 8,
        "learning_rate": 1e-3,
        "quantization": {"min_bits": 2, "max_bits": 8, "target_bits": 4.0,
                         "grid_size": 4, "bit_mapping": "linear"},
        "curriculum": {"enabled": False, "warmup_epochs": 0,
                       "transition_epochs": 0},
        "distillation": {"enabled": False},
        "training": {"map_interval": 10, "amp": False, "parallel": "fsdp"},
        "seed": 0,
        "output_dir": str(tmp_path / "out"),
    }
    t1 = Trainer(config)
    t1.train_epoch(0)  # one real FSDP epoch so opt_state is non-trivial
    t1.save_checkpoint("resume.ckpt", 0)

    t2 = Trainer(dict(config, output_dir=str(tmp_path / "out2")))
    t2.load_checkpoint(str(tmp_path / "out" / "resume.ckpt"))

    ref = jax.device_get(t1.state)
    got = jax.device_get(t2.state)
    for name, a, b in (("params", ref.params, got.params),
                       ("quant_stats", ref.quant_stats, got.quant_stats),
                       ("opt_state", ref.opt_state, got.opt_state)):
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        assert len(la) == len(lb), name
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=name)
    assert int(got.step) == int(ref.step) and int(got.step) > 0

    # the restored state is actually SHARDED (not silently replicated)
    from mcaq_yolo_tpu.parallel.fsdp import shard_fraction

    assert shard_fraction(t2.state.params, t2.mesh) > 0.7
    big = [l for l in jax.tree_util.tree_leaves(t2.state.params)
           if l.size >= 2 ** 14]
    assert big and any(not l.sharding.is_fully_replicated for l in big)
