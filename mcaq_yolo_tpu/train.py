"""
Trainer + `mcaq-yolo-train` CLI (reference train.py, TPU-native redesign).

Host-side epoch loop drives two jitted device programs:
  * train_step — forward (MCAQ quantized, fractional bits) + teacher KD +
    Eq.20 loss + AdamW update + grad clip 1.0 + Eq.18 |W| projection, with
    EMA quantizer stats threaded through the 'quant_stats' collection.
  * eval_step  — eval-mode forward + DFL decode + fixed-shape NMS.

Everything that changes per epoch (temperature, loss weights, target bits)
is passed as TRACED scalars, so no recompiles across epochs; the only static
re-specializations are the Stage-1 -> Stage-2 `quantize` flip and the KD
on/off choice.  Curriculum subset sampling happens host-side on cached
complexity scores, keeping batch shapes static (SURVEY.md §7).

Data parallelism: the batch is sharded along the mesh 'data' axis and
parameters replicated; XLA inserts the ICI gradient all-reduces.  Set
`training.parallel: fsdp` to instead shard parameters + optimizer state +
teacher across the same axis (parallel/fsdp.py — memory capacity for
yolov8l/x + KD; GSPMD inserts the per-layer all-gathers).
"""

from __future__ import annotations

import argparse
import json
import os
import time
import warnings
from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization
from flax.training import train_state

from .core.bit_allocation import enforce_monotonic_params
from .core.curriculum import CurriculumScheduler
from .core.morphology import score_image_eq8
from .data.dataset import (
    DataLoader,
    YOLODataset,
    compute_dataset_complexity,
    load_dataset_yaml,
)
from .models import MCAQYOLO, YOLOv8
from .models.losses import MCAQYOLOLoss, kd_feature_loss
from .models.yolo import decode_and_nms
from .parallel.mesh import make_mesh, replicate, shard_batch
from .utils.evaluation import (
    compute_map,
    compute_map50_95,
    detections_to_numpy,
    extract_targets_per_image,
)
from .utils.repro import set_global_seed


class TrainState(train_state.TrainState):
    """Optax train state extended with the flax mutable collections."""

    batch_stats: Any = None
    quant_stats: Any = None
    buffers: Any = None


# ---------------------------------------------------------------------------
# Jitted step builders
# ---------------------------------------------------------------------------


def make_train_step(model: MCAQYOLO, loss_obj: MCAQYOLOLoss,
                    teacher: Optional[YOLOv8] = None):
    """Build the jitted train step.  `quantize` and `use_kd` are static
    (structural); temperature/weights/target_bits are traced scalars."""

    @partial(jax.jit, static_argnames=("quantize", "use_kd"), donate_argnums=(0,))
    def train_step(
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        teacher_vars,
        temperature: jnp.ndarray,
        target_bits: jnp.ndarray,
        lw_bit: jnp.ndarray,
        lw_smooth: jnp.ndarray,
        lw_kd: jnp.ndarray,
        lw_reg: jnp.ndarray,
        quantize: bool = True,
        use_kd: bool = False,
    ):
        images = batch["image"]

        def loss_fn(params):
            (out, updates) = model.apply(
                {
                    "params": params,
                    "batch_stats": state.batch_stats,
                    "quant_stats": state.quant_stats,
                    "buffers": state.buffers,
                },
                images,
                temperature=temperature,
                quantize=quantize,
                training=True,
                mutable=["batch_stats", "quant_stats"],
            )
            raw_maps, aux = out

            teacher_maps = None
            if use_kd and teacher is not None:
                teacher_maps = teacher.apply(teacher_vars, images)
                t_feats = teacher.apply(teacher_vars, images, method="features")
                # feature KD: student's QUANTIZED C3/C4/C5 vs teacher FP32
                # (reference train.py:599-610)
                aux["kd_feature_loss"] = kd_feature_loss(
                    aux["quantized_features"], t_feats
                )

            loss_weights = {
                "detection": jnp.float32(1.0),
                "bit_budget": lw_bit,
                "smoothness": lw_smooth,
                "distillation": lw_kd,
                "regularization": lw_reg,
            }
            total, loss_dict = loss_obj(
                raw_maps, batch, aux,
                teacher_maps=teacher_maps,
                mapper_params=params.get("bit_mapper"),
                loss_weights=loss_weights,
                target_bits=target_bits,
            )
            return total, (loss_dict, updates, aux["avg_bits"], aux["bit_map"])

        (loss, (loss_dict, updates, avg_bits, bit_maps)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        )

        new_state = state.apply_gradients(
            grads=grads,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            quant_stats=updates.get("quant_stats", state.quant_stats),
        )
        # Eq.(18): |W| re-projection of the bit mapper after every step
        if "bit_mapper" in new_state.params:
            params = dict(new_state.params)
            params["bit_mapper"] = enforce_monotonic_params(params["bit_mapper"])
            new_state = new_state.replace(params=params)

        # integer-bit histogram over 2..8 for the epoch log (in-graph)
        hist = jnp.zeros((7,), jnp.int32)
        for bm in bit_maps:
            b = jnp.clip(jnp.round(bm), 2, 8).astype(jnp.int32) - 2
            hist = hist.at[b.reshape(-1)].add(1)

        metrics = {k: v for k, v in loss_dict.items()}
        metrics["avg_bits"] = avg_bits
        metrics["bit_hist"] = hist
        return new_state, metrics

    return train_step


def make_eval_step(model: MCAQYOLO, num_classes: int,
                   conf_threshold: float = 0.001, iou_threshold: float = 0.65,
                   max_det: int = 300):
    """Eval-mode forward + decode + NMS, jitted.  Returns padded detections
    + avg_bits (the eval contract of utils.evaluation.evaluate_mcaq_yolo)."""

    @partial(jax.jit, static_argnames=("quantize",))
    def eval_step(variables, images, temperature, quantize: bool = True):
        raw_maps, aux = model.apply(
            variables, images,
            temperature=temperature, quantize=quantize, training=False,
        )
        det = decode_and_nms(
            raw_maps, num_classes,
            conf_threshold=conf_threshold, iou_threshold=iou_threshold,
            max_det=max_det,
        )
        return det + (aux["avg_bits"],)

    return eval_step


def export_teacher_from_ckpt(ckpt_path: str, out_path: str,
                             variant: str, num_classes: int,
                             img_size: int = 640) -> str:
    """Extract the detector (backbone/neck/head params + BN stats) from a
    trained MCAQ checkpoint into a plain-YOLOv8 variables tree — the FP32
    teacher format `Trainer` loads for KD (the reference loads an
    Ultralytics-trained teacher, train.py:83-94; in this no-download env
    the teacher is trained in-framework)."""
    teacher = YOLOv8(variant, num_classes)
    dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    template = teacher.init(jax.random.PRNGKey(0), dummy)
    payload = serialization.msgpack_restore(Path(ckpt_path).read_bytes())
    tvars = {
        "params": {k: payload["params"][k]
                   for k in ("backbone", "neck", "head")},
        "batch_stats": {k: payload["batch_stats"][k]
                        for k in template["batch_stats"]},
    }
    # template round-trip validates structure + shapes
    tvars = serialization.from_bytes(template, serialization.to_bytes(tvars))
    Path(out_path).write_bytes(serialization.to_bytes(tvars))
    return out_path


def weight_decay_mask(params, decay_bit_mapper: bool = False):
    """AdamW decay mask: True = decay.  By default every parameter under a
    `bit_mapper` module is EXCLUDED from weight decay — a deliberate,
    documented deviation from the reference (train.py:145-150 decays all
    parameters).  Rationale: under the Eq.18 |W| monotone projection decay
    is a one-way ratchet (kernels can only shrink, never recover through
    zero), and Adam rescales the tiny sign-consistent shrink gradients to
    full lr-sized steps; measured, the mapper's last Dense kernels collapse
    to ~1e-18 within 50 epochs and b(C) degenerates to a constant."""

    def mark(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return decay_bit_mapper or "bit_mapper" not in names

    return jax.tree_util.tree_map_with_path(mark, params)


def make_val_loss_step(model: MCAQYOLO, loss_obj: MCAQYOLOLoss):
    """Per-epoch validation LOSS (reference train.py:712-775 computes val
    loss every epoch; NMS mAP runs on the map_interval cadence).  Eval-mode
    forward at the epoch's temperature/quantize flag, detection + bit +
    smooth losses, no KD."""

    @partial(jax.jit, static_argnames=("quantize",))
    def val_loss_step(variables, batch, temperature, target_bits,
                      lw_bit, lw_smooth, lw_reg, quantize: bool = True):
        raw_maps, aux = model.apply(
            variables, batch["image"],
            temperature=temperature, quantize=quantize, training=False,
        )
        loss_weights = {
            "detection": jnp.float32(1.0),
            "bit_budget": lw_bit,
            "smoothness": lw_smooth,
            "distillation": jnp.float32(0.0),
            "regularization": lw_reg,
        }
        total, _ = loss_obj(
            raw_maps, batch, aux,
            teacher_maps=None,
            mapper_params=variables["params"].get("bit_mapper"),
            loss_weights=loss_weights,
            target_bits=target_bits,
        )
        return total

    return val_loss_step


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------


class Trainer:
    """End-to-end MCAQ-YOLO trainer, consuming the reference's YAML schema
    (reference configs/train_config.yaml — same keys, same defaults)."""

    def __init__(self, config: Dict):
        self.config = config
        seed = int(config.get("seed", 0))
        set_global_seed(seed, bool(config.get("deterministic", False)))
        self.seed = seed

        self.epochs = int(config.get("epochs", 300))
        self.batch_size = int(config.get("batch_size", 16))
        self.lr = float(config.get("learning_rate", 1e-3))
        self.output_dir = Path(config.get("output_dir", "outputs"))
        self.output_dir.mkdir(parents=True, exist_ok=True)

        mcfg = config.get("model", {})
        qcfg = config.get("quantization", {})
        ccfg = config.get("curriculum", {})
        dcfg = config.get("data", {})

        self.num_classes = int(mcfg.get("num_classes", 80))
        self.img_size = int(dcfg.get("img_size", 640))
        self.variant = str(mcfg.get("name", "yolov8n"))
        if not self.variant.startswith("yolov8"):
            self.variant = f"yolov8{self.variant[-1]}"

        # ---- model ----
        # amp: true -> bfloat16 network compute on TPU (the analogue of the
        # reference's CUDA-only AMP gate, train.py:188-194); params, raw
        # detect maps, the metric pipeline and calibration stats stay fp32.
        amp = bool(config.get("training", {}).get("amp", True))
        # 'axon' is the tunneled single-chip TPU platform on this host
        on_tpu = jax.default_backend() in ("tpu", "axon")
        self.dtype = jnp.bfloat16 if (amp and on_tpu) else jnp.float32
        self.model = MCAQYOLO(
            variant=self.variant,
            num_classes=self.num_classes,
            min_bits=int(qcfg.get("min_bits", 2)),
            max_bits=int(qcfg.get("max_bits", 8)),
            target_bits=float(qcfg.get("target_bits", 4.0)),
            grid_size=int(qcfg.get("grid_size", 8)),
            bit_mapping=str(qcfg.get("bit_mapping", "mlp")),
            monotone_param=str(qcfg.get("monotone_param", "softplus")),
            normalize_complexity=bool(qcfg.get("normalize_complexity", False)),
            morph_downsample=int(
                config.get("morphology", {}).get("downsample", 1)),
            morph_tile_engine=str(
                config.get("morphology", {}).get("tile_engine", "lanes")),
            dtype=self.dtype,
        )
        self.loss_obj = MCAQYOLOLoss(self.num_classes,
                                     float(qcfg.get("target_bits", 4.0)))

        # ---- teacher (FP32 KD) ----
        self.kd_enabled = bool(config.get("distillation", {}).get("enabled", True))
        self.teacher = YOLOv8(self.variant, self.num_classes) if self.kd_enabled else None
        self.teacher_vars = None

        # ---- data ----
        yaml_path = dcfg.get("yaml_path")
        if yaml_path and os.path.exists(str(yaml_path)):
            ds = load_dataset_yaml(str(yaml_path))
            train_dir, val_dir = ds["train"], ds["val"]
        else:
            train_dir = dcfg.get("train")
            val_dir = dcfg.get("val", train_dir)
        max_boxes = int(dcfg.get("max_boxes", 128))
        # full reference-strength augmentation by default (the reference
        # trains through Ultralytics' pipeline: mosaic 1.0, fliplr 0.5, HSV —
        # reference train.py:302-371); all probabilities configurable
        self.train_dataset = YOLODataset(
            train_dir, self.img_size, max_boxes, augment=True, seed=seed,
            hflip_p=float(dcfg.get("hflip_p", 0.5)),
            hsv_p=float(dcfg.get("hsv_p", 0.5)),
            mosaic_p=float(dcfg.get("mosaic_p", 1.0)),
            scale_jitter=float(dcfg.get("scale", 0.5)),
            translate=float(dcfg.get("translate", 0.1)),
            cache_images=bool(dcfg.get("cache", True)),
        )
        self.val_dataset = YOLODataset(
            val_dir, self.img_size, max_boxes, augment=False, seed=seed
        )
        self.num_workers = int(dcfg.get("num_workers", 0))
        # device-resident pipeline (data.device_pipeline): preload both
        # splits to HBM once and ship per-batch augmentation PLANS instead
        # of pixels.  Essential over the single-admission device tunnel,
        # where per-batch image transfer is ~10 s (data/device_pipeline.py
        # module docstring); off by default so the host path stays the
        # reference-semantics arbiter.
        self.device_pipeline = bool(dcfg.get("device_pipeline", False))
        if self.device_pipeline:
            from .data.device_pipeline import DevicePipeline

            self._dev_train = DevicePipeline(self.train_dataset)
            self._dev_val = DevicePipeline(self.val_dataset)
            self.train_loader = self._dev_train.loader(
                self.batch_size, shuffle=True, seed=seed)
            self.val_loader = self._dev_val.loader(
                self.batch_size, shuffle=False, drop_last=False,
                augment=False)
        else:
            self.train_loader = DataLoader(
                self.train_dataset, self.batch_size, shuffle=True, seed=seed,
                num_workers=self.num_workers,
            )
            self.val_loader = DataLoader(
                self.val_dataset, self.batch_size, shuffle=False,
                drop_last=False, num_workers=self.num_workers,
            )

        # ---- curriculum ----
        self.curriculum_cfg = ccfg
        self.curriculum = CurriculumScheduler(
            warmup_epochs=int(ccfg.get("warmup_epochs", 20)),
            transition_epochs=int(ccfg.get("transition_epochs", 50)),
            total_epochs=self.epochs,
            initial_complexity=float(ccfg.get("initial_complexity", 0.2)),
            initial_temperature=float(ccfg.get("initial_temperature", 10.0)),
            lambda_smooth=float(ccfg.get("lambda_smooth", 0.1)),
            target_bits=float(qcfg.get("target_bits", 4.0)),
            # lambda1 saturation gate (default ON): zero bit-budget
            # pressure while alpha_t pins the whole map at max_bits — the
            # window that crushes the reference-default 'abs' mapper into
            # a uniform allocation (PARITY.md "MLP-mapper degeneracy").
            # Set curriculum.lambda_bit_gate: false for the
            # reference-exact (ungated) lambda1 anneal.
            lambda_bit_gate=bool(ccfg.get("lambda_bit_gate", True)),
            min_bits=float(qcfg.get("min_bits", 2)),
            max_bits=float(qcfg.get("max_bits", 8)),
            # Anneal-horizon decoupling for short protocols (VERDICT r4
            # item 1): alpha_t + target-bits complete at anneal_epochs,
            # leaving the post-anneal epochs at deployment temperature
            # with lambda1 at full gate strength.  Defaults (None/'exp')
            # keep the reference-exact full-run anneal.
            anneal_epochs=(int(ccfg["anneal_epochs"])
                           if ccfg.get("anneal_epochs") else None),
            budget_anneal=str(ccfg.get("budget_anneal", "exp")),
            # closed-loop lambda1 boost toward the bit budget once the
            # allocation is live (core/curriculum.py docstring); the fixed
            # reference schedule alone settles ~1-1.5 bits above target
            budget_controller=bool(ccfg.get("budget_controller", False)),
            controller_kp=float(ccfg.get("controller_kp", 0.3)),
            controller_deadband=float(ccfg.get("controller_deadband", 0.1)),
        )
        self.complexity_scores = None
        if ccfg.get("enabled", True):
            self.complexity_scores = self._compute_complexity_scores()

        # ---- optimizer: AdamW + warmup-cosine (reference train.py:140-185) ----
        ocfg = config.get("optimizer", {})
        scfg = config.get("scheduler", {})
        steps_per_epoch = max(1, len(self.train_loader))
        warmup_steps = int(scfg.get("warmup_epochs", 5)) * steps_per_epoch
        total_steps = self.epochs * steps_per_epoch
        schedule = optax.join_schedules(
            [
                optax.linear_schedule(self.lr * 0.01, self.lr, max(1, warmup_steps)),
                optax.cosine_decay_schedule(
                    self.lr, max(1, total_steps - warmup_steps),
                    alpha=float(scfg.get("eta_min", 1e-6)) / self.lr,
                ),
            ],
            [warmup_steps],
        )
        opt_type = str(ocfg.get("type", "adamw")).lower()
        betas = ocfg.get("betas", [0.9, 0.999])
        if opt_type == "adamw":
            # bit mapper excluded from decay by default — see
            # weight_decay_mask for the measured collapse rationale;
            # optimizer.decay_bit_mapper: true restores reference behavior
            decay_mapper = bool(ocfg.get("decay_bit_mapper", False))
            opt = optax.adamw(
                schedule, b1=betas[0], b2=betas[1],
                weight_decay=float(ocfg.get("weight_decay", 0.05)),
                mask=lambda p: weight_decay_mask(p, decay_mapper),
            )
        else:
            opt = optax.adam(schedule, b1=betas[0], b2=betas[1])
        # Table X: gradient clipping 1.0
        self.optimizer = optax.chain(optax.clip_by_global_norm(1.0), opt)
        self.schedule = schedule

        # ---- init params + device mesh ----
        # the data mesh must divide the batch: use gcd(batch, devices)
        import math as _math

        n_use = max(1, _math.gcd(self.batch_size, jax.device_count()))
        self.mesh = make_mesh(n_use)
        if n_use < jax.device_count():
            print(
                f"[MCAQ] data mesh uses {n_use}/{jax.device_count()} devices "
                f"(batch {self.batch_size} must divide the mesh)"
            )
        # 'dp' (default) replicates params/optimizer/teacher; 'fsdp' shards
        # every large leaf across the same mesh (parallel/fsdp.py) — a
        # memory-capacity option for yolov8l/x + KD at large batch.
        self.parallel_mode = str(
            config.get("training", {}).get("parallel", "dp")).lower()
        if self.parallel_mode not in ("dp", "fsdp"):
            raise ValueError(
                f"training.parallel must be 'dp' or 'fsdp', got "
                f"{self.parallel_mode!r}")
        self._init_state()

        self.map_interval = max(
            1, int(config.get("training", {}).get("map_interval", 1))
        )
        self.train_step = make_train_step(self.model, self.loss_obj, self.teacher)
        self.eval_step = make_eval_step(self.model, self.num_classes)
        self.val_loss_step = make_val_loss_step(self.model, self.loss_obj)
        self.history: list = []
        self.best_map = -1.0

    # ------------------------------------------------------------------

    def _init_state(self):
        rng = jax.random.PRNGKey(self.seed)
        dummy = jnp.zeros((1, self.img_size, self.img_size, 3), jnp.float32)
        variables = self.model.init(rng, dummy, training=False)
        params = variables["params"]
        if "bit_mapper" in params:  # absent for the parameter-free linear mapper
            params["bit_mapper"] = enforce_monotonic_params(params["bit_mapper"])
        self.state = TrainState.create(
            apply_fn=self.model.apply,
            params=params,
            tx=self.optimizer,
            batch_stats=variables.get("batch_stats", {}),
            quant_stats=variables.get("quant_stats", {}),
            buffers=variables.get("buffers", {}),
        )

        if self.teacher is not None:
            tpath = self.config.get("model", {}).get("teacher_path")
            tvars = self.teacher.init(jax.random.PRNGKey(self.seed + 1), dummy)
            if tpath and os.path.exists(str(tpath)):
                with open(tpath, "rb") as f:
                    tvars = serialization.from_bytes(tvars, f.read())
                print(f"[MCAQ] teacher loaded from {tpath}")
            else:
                # fail fast: distilling from a random teacher trains against
                # noise.  The reference hard-requires a teacher when KD is on
                # (reference train.py:83-94).
                raise FileNotFoundError(
                    f"distillation.enabled=true but model.teacher_path "
                    f"{tpath!r} does not exist — train one with `Trainer` on "
                    "the plain YOLOv8, convert torch weights "
                    "(models/weights_io.py), or set distillation.enabled: "
                    "false."
                )
            self.teacher_vars = tvars

        # commit parallel-mode shardings; batches get sharded per step
        self.state = self._place(self.state)
        if self.teacher_vars is not None:
            self.teacher_vars = self._place(self.teacher_vars)
        if self.parallel_mode == "fsdp":
            from .parallel.fsdp import shard_fraction

            frac = shard_fraction(self.state, self.mesh)
            print(f"[MCAQ] FSDP over {self.mesh.size} devices: "
                  f"{frac:.0%} of train-state elements sharded")

    def _place(self, tree):
        """Commit the parallel-mode shardings (DP replicate / FSDP shard)."""
        if self.parallel_mode == "fsdp":
            from .parallel.fsdp import fsdp_shard

            return fsdp_shard(tree, self.mesh)
        return replicate(self.mesh, tree)

    # ------------------------------------------------------------------

    def _score_fn(self):
        """Deterministic per-image scorer for the curriculum (Eq.8).

        backend 'train' (default) uses the jitted JAX phi pipeline — the same
        metric backend the training forward uses (single source of truth);
        'cv2' uses the exact OpenCV reference (CPU-bound)."""
        backend = str(self.curriculum_cfg.get("score_backend", "train"))
        if backend == "cv2":
            from .core import morphology_cv2

            return lambda imgs: morphology_cv2.score_image_cv2(np.asarray(imgs))

        analyzer_apply = jax.jit(
            lambda v, x: self.model.apply(v, x, method="score_image")
        )

        def fn(imgs):
            variables = {
                "params": jax.device_get(self.state.params),
                "batch_stats": jax.device_get(self.state.batch_stats),
                "quant_stats": jax.device_get(self.state.quant_stats),
                "buffers": jax.device_get(self.state.buffers),
            }
            return np.asarray(analyzer_apply(variables, jnp.asarray(imgs)))

        return fn

    def _compute_complexity_scores(self) -> np.ndarray:
        """Offline Algorithm-3 scoring on an augmentation-free dataset copy,
        cached with a fingerprint (reference train.py:399-478)."""
        scoring_ds = YOLODataset(
            self.train_dataset.img_dir, self.img_size,
            self.train_dataset.max_boxes, augment=False,
        )
        cache = self.output_dir / "complexity_scores.npy"
        backend = str(self.curriculum_cfg.get("score_backend", "train"))
        if backend == "cv2":
            return compute_dataset_complexity(
                scoring_ds, self._score_fn_lazy(backend),
                cache_path=str(cache), backend=backend,
                img_size=self.img_size,
            )
        if backend == "edge":
            # cheap model-free edge-density proxy (opt-in)
            return compute_dataset_complexity(
                scoring_ds, None, cache_path=str(cache), backend="edge",
                img_size=self.img_size,
            )
        # default 'train': the paper's Eq.(8) five-metric fused score
        # (reference train.py:399-478 scores with analyzer.score_image).
        # Uniform initial alpha — a pure function of the image, so it is
        # safely cacheable before any parameters exist; the trained-MLP
        # rescore happens at the Stage-2 boundary (fit_feature_weights +
        # rescore_curriculum in train()).
        eq8 = jax.jit(partial(score_image_eq8, grid_size=self.model.grid_size))
        return compute_dataset_complexity(
            scoring_ds, lambda imgs: np.asarray(eq8(jnp.asarray(imgs))),
            cache_path=str(cache), backend="train-eq8",
            img_size=self.img_size,
        )

    def _score_fn_lazy(self, backend):
        from .core import morphology_cv2

        return lambda imgs: morphology_cv2.score_image_cv2(np.asarray(imgs))

    def fit_feature_weights(self, max_batches: int = 16):
        """Post-hoc Eq.(8) alpha refit (reference morphology.py:875-921):
        NNLS-fit the feature_weights buffer to the TRAINED complexity MLP so
        offline Eq.(8) sorting reflects the learned notion of complexity.
        Call after training, before recomputing curriculum scores."""
        from .core import morphology_cv2
        from .core.morphology import compute_phi_tiles

        variables = {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "quant_stats": jax.device_get(self.state.quant_stats),
            "buffers": jax.device_get(self.state.buffers),
        }

        phi_fn = jax.jit(lambda x: compute_phi_tiles(x, self.model.grid_size)[0])
        mlp_fn = jax.jit(
            lambda v, p: self.model.apply(
                v, p, method=lambda mdl, phi: mdl.complexity_analyzer
                .complexity_mlp(phi.reshape(-1, 8))
            )
        )

        phis, cs = [], []
        for i, batch in enumerate(self.train_loader):
            x = jnp.asarray(batch["image"])
            phi = phi_fn(x)
            c = mlp_fn(variables, phi)
            phis.append(np.asarray(phi).reshape(-1, 8))
            cs.append(np.asarray(c).reshape(-1))
            if i + 1 >= max_batches:
                break

        alpha = morphology_cv2.fit_feature_weights(
            np.concatenate(phis), np.concatenate(cs)
        )
        buffers = dict(jax.device_get(self.state.buffers))
        analyzer_buf = dict(buffers.get("complexity_analyzer", {}))
        analyzer_buf["feature_weights"] = jnp.asarray(alpha, jnp.float32)
        buffers["complexity_analyzer"] = analyzer_buf
        self.state = self.state.replace(buffers=buffers)
        self.state = self._place(self.state)
        return alpha

    def rescore_curriculum(self):
        """Re-score the dataset with the (trained) analyzer's Eq.8 weights."""
        scoring_ds = YOLODataset(
            self.train_dataset.img_dir, self.img_size,
            self.train_dataset.max_boxes, augment=False,
        )
        self.complexity_scores = compute_dataset_complexity(
            scoring_ds, self._score_fn(), cache_path=None
        )

    def _curriculum_indices(self, tau_t: float) -> Optional[np.ndarray]:
        """Algorithm 3 line 9: D_t = {x : C(x) <= tau_t}; fall back to the
        easiest max(batch, 64) samples when too few qualify."""
        if tau_t >= 1.0 or self.complexity_scores is None:
            return None
        idx = np.where(self.complexity_scores <= tau_t)[0]
        min_needed = max(self.batch_size, 64)
        if len(idx) < min_needed:
            idx = np.argsort(self.complexity_scores)[:min_needed]
        return idx

    # ------------------------------------------------------------------

    def _variables(self):
        return {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "quant_stats": self.state.quant_stats,
            "buffers": self.state.buffers,
        }

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        stage = self.curriculum.get_stage(epoch)
        temp = self.curriculum.get_effective_temperature(epoch)
        tau_t = self.curriculum.get_complexity_threshold(epoch)
        weights = self.curriculum.get_loss_weights(epoch)
        target_bits = self.curriculum.get_target_bits(epoch)
        quantize = stage >= 2  # Stage 1: high-precision warm-up

        indices = self._curriculum_indices(tau_t)
        if indices is None:
            loader = self.train_loader
        elif self.device_pipeline:
            loader = self._dev_train.loader(
                self.batch_size, shuffle=True, indices=indices,
                seed=self.seed + epoch)
        else:
            loader = DataLoader(self.train_dataset, self.batch_size,
                                shuffle=True, indices=indices,
                                seed=self.seed + epoch,
                                num_workers=self.num_workers)

        agg: Dict[str, float] = {}
        hist = np.zeros(7, np.int64)
        n_batches = 0
        for batch in loader:
            batch = shard_batch(self.mesh, {
                k: jnp.asarray(v) for k, v in batch.items() if k != "paths"
            })
            self.state, metrics = self.train_step(
                self.state, batch, self.teacher_vars,
                jnp.float32(temp), jnp.float32(target_bits),
                jnp.float32(weights["bit_budget"]),
                jnp.float32(weights["smoothness"]),
                jnp.float32(weights["distillation"]),
                jnp.float32(weights["regularization"]),
                quantize=quantize,
                use_kd=self.kd_enabled,
            )
            metrics = jax.device_get(metrics)
            hist += np.asarray(metrics.pop("bit_hist"), np.int64)
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            n_batches += 1

        out = {k: v / max(1, n_batches) for k, v in agg.items()}
        out.update(stage=stage, temperature=temp, tau=tau_t,
                   target_bits=target_bits, quantize=float(quantize))
        self._log_epoch(epoch, out, hist)
        return out

    def _log_epoch(self, epoch: int, m: Dict[str, float], hist: np.ndarray):
        print(
            f"[epoch {epoch:3d}] stage={int(m['stage'])} "
            f"loss={m.get('loss_total', 0):.4f} det={m.get('loss_det', 0):.4f} "
            f"bits={m.get('avg_bits', 0):.2f} temp={m['temperature']:.2f} "
            f"tau={m['tau']:.2f}"
        )
        total = max(1, hist.sum())
        bars = " ".join(
            f"{b}b:{'#' * int(20 * c / total)}({c})"
            for b, c in zip(range(2, 9), hist) if c > 0
        )
        print(f"          bit-dist {bars}")

    # ------------------------------------------------------------------

    def compute_val_loss(self, epoch: int) -> float:
        """Mean validation loss at the epoch's curriculum settings, every
        epoch (reference train.py:712-775)."""
        stage = self.curriculum.get_stage(epoch)
        temp = self.curriculum.get_effective_temperature(epoch)
        weights = self.curriculum.get_loss_weights(epoch)
        target_bits = self.curriculum.get_target_bits(epoch)
        variables = self._variables()
        total, n, n_skipped = 0.0, 0, 0
        for batch in self.val_loader:
            if batch["image"].shape[0] != self.batch_size:
                n_skipped += 1  # keep one compiled shape; ragged tail skipped
                continue
            b = {k: jnp.asarray(v) for k, v in batch.items() if k != "paths"}
            total += float(jax.device_get(self.val_loss_step(
                variables, b, jnp.float32(temp), jnp.float32(target_bits),
                jnp.float32(weights["bit_budget"]),
                jnp.float32(weights["smoothness"]),
                jnp.float32(weights["regularization"]),
                quantize=stage >= 2,
            )))
            n += 1
        if n_skipped and n == 0:
            warnings.warn(
                f"compute_val_loss: ALL {n_skipped} val batches were ragged "
                f"(< batch_size={self.batch_size}) and skipped — returning "
                "0.0. Use a val set with >= batch_size images or a smaller "
                "batch_size.", stacklevel=2)
        elif n_skipped:
            warnings.warn(
                f"compute_val_loss: skipped {n_skipped} ragged val "
                f"batch(es) to keep one compiled shape; loss averaged over "
                f"{n} full batches.", stacklevel=2)
        return total / max(1, n)

    def evaluate(self, epoch: int) -> Dict[str, float]:
        """Val mAP@0.5 at the epoch's alpha_t and stage quantize flag
        (reference train.py:712-775)."""
        stage = self.curriculum.get_stage(epoch)
        temp = self.curriculum.get_effective_temperature(epoch)
        quantize = stage >= 2

        predictions, targets = [], []
        bits = []
        variables = self._variables()
        n_dev = self.mesh.size
        for batch in self.val_loader:
            images = jnp.asarray(batch["image"])
            # distributed eval: shard the batch across the mesh like the
            # train step does (VERDICT r1 weak-5).  The val loader keeps
            # ragged tails (drop_last=False), so shard only when divisible.
            if images.shape[0] % n_dev == 0:
                images = shard_batch(self.mesh, {"image": images})["image"]
            det = self.eval_step(variables, images, jnp.float32(temp),
                                 quantize=quantize)
            det = jax.device_get(det)
            b, s, c, v, avg_bits = det
            predictions.extend(detections_to_numpy(b, s, c, v))
            targets.extend(extract_targets_per_image(batch))
            bits.append(float(avg_bits))

        res = compute_map(predictions, targets, 0.5)
        # COCO-style mAP@[.5:.95] — the BASELINE quality metric; matching is
        # host-side numpy over already-fetched detections, so the 10-
        # threshold sweep is cheap at eval cadence
        res5095 = compute_map50_95(predictions, targets)
        return {
            "map50": res["map"],
            "map50_95": res5095["map50_95"],
            "avg_bits": float(np.mean(bits)) if bits else 0.0,
            "quantized": float(quantize),
        }

    # ------------------------------------------------------------------

    def save_checkpoint(self, name: str, epoch: int):
        state = jax.device_get(self.state)
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "quant_stats": state.quant_stats,
            "buffers": state.buffers,
            "opt_state": state.opt_state,
            "step": int(state.step),
        }
        blob = serialization.to_bytes(payload)
        path = self.output_dir / name
        path.write_bytes(blob)
        cfg = {
            k: v for k, v in self.config.items()
            if isinstance(v, (int, float, str, bool, dict, list))
        }
        # Mirror the RESOLVED model-defining values into meta, not just the
        # raw user config: a yaml that omits a key (e.g. monotone_param)
        # relies on the Trainer-side default, and Predictor restores the
        # model FROM META — if meta echoed only the raw config, a default
        # flip between train and deploy time would silently rebuild the
        # wrong parameter topology and tolerant_restore would keep
        # freshly-initialized weights for the mismatched leaves.
        m = self.model
        cfg["quantization"] = dict(
            cfg.get("quantization", {}),
            min_bits=int(m.min_bits), max_bits=int(m.max_bits),
            target_bits=float(m.target_bits), grid_size=int(m.grid_size),
            bit_mapping=m.bit_mapping, monotone_param=m.monotone_param,
            normalize_complexity=bool(m.normalize_complexity),
        )
        cfg["morphology"] = dict(
            cfg.get("morphology", {}),
            downsample=int(m.morph_downsample),
            tile_engine=m.morph_tile_engine,
        )
        meta = {
            "epoch": epoch,
            "variant": self.variant,
            "num_classes": self.num_classes,
            "img_size": self.img_size,
            # budget-controller trim: a model trained under bit_scale=s
            # deploys its bit maps at temperature s (1.0 when the
            # controller is off — the reference-exact deployment)
            "deploy_temperature": float(self.curriculum.bit_scale),
            "config": cfg,
        }
        (self.output_dir / (name + ".json")).write_text(
            json.dumps(meta, indent=2, default=str)
        )

    def load_checkpoint(self, path: str):
        """True resume (beyond the reference, which saves weights only —
        SURVEY.md §5 checkpoint/resume): restores params, EMA quantizer
        stats, BN stats AND optimizer state."""
        blob = Path(path).read_bytes()
        state = jax.device_get(self.state)
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "quant_stats": state.quant_stats,
            "buffers": state.buffers,
            "opt_state": state.opt_state,
            "step": 0,
        }
        payload = serialization.from_bytes(template, blob)
        self.state = self.state.replace(
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            quant_stats=payload["quant_stats"],
            buffers=payload["buffers"],
            opt_state=payload["opt_state"],
            step=payload["step"],
        )
        self.state = self._place(self.state)

    # ------------------------------------------------------------------

    def train(self) -> Dict:
        """Full training loop with best/last checkpointing (best = peak
        quantized mAP@0.5 from Stage 3 on — reference train.py:787-838)."""
        t0 = time.time()
        rescored = False
        for epoch in range(self.epochs):
            self.curriculum.current_epoch = epoch

            # Stage-2 boundary: the complexity MLP has trained through the
            # warm-up, so refit the Eq.(8) alpha buffer to it (NNLS) and
            # re-sort the curriculum with the learned notion of complexity
            # (VERDICT r1 item 6; reference refits post-hoc,
            # morphology.py:875-921 — doing it at the boundary lets the
            # tau_t filter use the trained ordering for Stages 2-3).
            if (
                not rescored
                and self.complexity_scores is not None
                and self.curriculum.get_stage(epoch) >= 2
            ):
                rescored = True
                try:
                    alpha = self.fit_feature_weights(max_batches=8)
                    self.rescore_curriculum()
                    print(f"[MCAQ] stage-2 Eq.8 alpha refit: {np.round(alpha, 4)}")
                except Exception as e:  # pragma: no cover - diagnostic path
                    print(f"[MCAQ][WARN] stage-2 rescore skipped: {e}")

            train_metrics = self.train_epoch(epoch)
            train_metrics["val_loss"] = self.compute_val_loss(epoch)

            # closed-loop bit-budget controller: feed back this epoch's
            # measured mean bit width; trims the NEXT epoch's bit_scale
            # (primary) and lambda1 boost (secondary) — no-op unless
            # curriculum.budget_controller is enabled
            if "avg_bits" in train_metrics:
                scale = self.curriculum.update_budget_controller(
                    train_metrics["avg_bits"], epoch)
                train_metrics["bit_scale"] = scale
                train_metrics["lambda1_boost"] = self.curriculum.lambda1_boost
                if scale != 1.0 or self.curriculum.lambda1_boost > 1.0:
                    print(f"          budget controller: bits="
                          f"{train_metrics['avg_bits']:.2f} -> bit_scale "
                          f"{scale:.3f}, lambda1 boost "
                          f"{self.curriculum.lambda1_boost:.2f}x")

            eval_metrics = {}
            if (epoch + 1) % self.map_interval == 0 or epoch == self.epochs - 1:
                eval_metrics = self.evaluate(epoch)
                stage = self.curriculum.get_stage(epoch)
                if stage >= 3 and eval_metrics["map50"] > self.best_map:
                    self.best_map = eval_metrics["map50"]
                    self.save_checkpoint("best.ckpt", epoch)
                print(
                    f"          val mAP@0.5={eval_metrics['map50']:.4f} "
                    f"mAP@0.5:0.95={eval_metrics['map50_95']:.4f} "
                    f"bits={eval_metrics['avg_bits']:.2f}"
                )

            self.save_checkpoint("last.ckpt", epoch)
            self.history.append({**train_metrics, **eval_metrics, "epoch": epoch})

        if self.best_map < 0:
            print(
                "[MCAQ] NOTE: training ended before Stage 3 — best.ckpt was "
                "never written; last.ckpt holds the final weights."
            )
        (self.output_dir / "history.json").write_text(
            json.dumps(self.history, indent=2, default=float)
        )
        return {
            "best_map50": self.best_map,
            "epochs": self.epochs,
            "wall_time_s": time.time() - t0,
        }


# ---------------------------------------------------------------------------
# CLI (reference train.py:843-869)
# ---------------------------------------------------------------------------


def main(argv=None):
    parser = argparse.ArgumentParser(description="MCAQ-YOLO-TPU training")
    parser.add_argument("--config", required=True, help="YAML config path")
    parser.add_argument("--device", default=None, help="unused on TPU (kept for CLI parity)")
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args(argv)

    import yaml

    with open(args.config) as f:
        config = yaml.safe_load(f)
    if args.output_dir:
        config["output_dir"] = args.output_dir
    if args.seed is not None:
        config["seed"] = args.seed

    trainer = Trainer(config)
    results = trainer.train()
    print(json.dumps(results, indent=2, default=float))


if __name__ == "__main__":
    main()
