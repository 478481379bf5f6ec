"""Quality-parity evidence: THREE-ARM protocol on the class-learnable
synthetic dataset v2 (BASELINE quality contract; VERDICT r2 item 1).

Round-2's protocol was structurally incapable of demonstrating mAP parity:
the v1 synthetic dataset drew class labels independently of appearance
(mAP ceiling ~1/nc) and its "fp32 arm" was the MCAQ weights with
quantization switched off.  This protocol fixes both:

  dataset v2   class IS a function of appearance (4 shapes x solid/textured
               x fixed color family) with spatially-heterogeneous complexity
               (data/dataset.py:make_synthetic_dataset_v2), separate
               train/val splits.

  arm A        FP32-TRAINED baseline: trained with quantization never
               enabled (curriculum pinned to Stage 1), evaluated in FP —
               the reference's separately-trained baseline/teacher protocol
               (reference train.py:83-94).
  arm B        MCAQ-TRAINED: full 3-stage curriculum, MLP bit mapper with
               per-image complexity normalization (the reference's flat-map
               fix), evaluated quantized at deployment temperature; also
               reports the DEPLOYED rounded bit-map spatial std + histogram
               (VERDICT r2 weak-3: must be non-degenerate).
  arm C        POST-HOC QUANTIZED: arm A's FP weights overlaid into an MCAQ
               model with the parameter-free linear mapper, EMA-calibrated
               (calibrate.py), evaluated quantized — what naive PTQ costs,
               the gap MCAQ training is supposed to close.
  arm M        MATCHED-BUDGET uniform PTQ (round 5, VERDICT r4 weak-6):
               arm A's FP weights EMA-calibrated and quantized at a
               CONSTANT bit width pinned to arm B's achieved average —
               the equal-budget control that makes "MCAQ recovers X over
               PTQ" an apples-to-apples claim.

  KD arm       (--kd-epochs) arm A's checkpoint exported as the FP32
               teacher; a logit+feature-KD student trained at the same bit
               target — compared against arm B at equal bits (VERDICT r2
               item 7: KD must earn its keep against a true FP teacher).

Round 5 defaults: synthetic dataset v3 (16 nuisance-color classes, 5-10
objects/image incl. small + occluded, distractor shapes — FP headroom per
VERDICT r4 item 2) and the decoupled anneal horizon (alpha_t/target-bits
complete at --anneal-frac of the run, budget anneal renormalized to land ON
target — VERDICT r4 item 1's schedule-compression fix).

Usage: python -m mcaq_yolo_tpu.scripts.quality_evidence
           [--img-size 640] [--epochs 60] [--fp-epochs 50] [--n-images 192]
           [--kd-epochs 0] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def _eval_quantized_arm(model, variables, val_loader, num_classes,
                        temperature=1.0, quantize=True):
    """Shared eval: mAP@0.5 / mAP@50-95 / avg_bits over the val loader."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..train import make_eval_step
    from ..utils.evaluation import (
        compute_map,
        compute_map50_95,
        detections_to_numpy,
        extract_targets_per_image,
    )

    eval_step = make_eval_step(model, num_classes)
    preds, targets, bits = [], [], []
    for batch in val_loader:
        images = jnp.asarray(batch["image"])
        det = jax.device_get(eval_step(
            variables, images, jnp.float32(temperature), quantize=quantize))
        b, s, c, v, avg_bits = det
        preds.extend(detections_to_numpy(b, s, c, v))
        targets.extend(extract_targets_per_image(batch))
        bits.append(float(avg_bits))
    m50 = compute_map(preds, targets, 0.5)["map"]
    m5095 = compute_map50_95(preds, targets)["map50_95"]
    return {
        "map50": m50,
        "map50_95": m5095,
        "avg_bits": float(np.mean(bits)) if quantize else 32.0,
    }


def _deployed_bitmap_stats(model, variables, val_loader, max_batches=2,
                           temperature=1.0):
    """Rounded deployed bit maps: per-image spatial std + 2..8 histogram
    (VERDICT r2 weak-3 acceptance: std > 0 means the MLP mapper actually
    allocates spatially).  `temperature` = the checkpoint's deployment
    temperature (the budget controller's bit_scale trim; 1.0 otherwise)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def fwd(variables, images):
        _, aux = model.apply(variables, images,
                             temperature=jnp.float32(temperature),
                             quantize=True, training=False)
        return aux["bit_map"], aux["complexity_map"]

    stds, cont_stds, cplx_stds, all_bits = [], [], [], []
    for i, batch in enumerate(val_loader):
        maps, cmaps = jax.device_get(fwd(variables,
                                         jnp.asarray(batch["image"])))
        for m, c in zip(maps, cmaps):  # per scale: (B, Ht, Wt)
            m = np.asarray(m, np.float64)
            cont_stds.extend(m.reshape(m.shape[0], -1).std(axis=1).tolist())
            r = np.round(m)
            stds.extend(r.reshape(r.shape[0], -1).std(axis=1).tolist())
            all_bits.extend(r.reshape(-1).tolist())
            c = np.asarray(c, np.float64)
            cplx_stds.extend(c.reshape(c.shape[0], -1).std(axis=1).tolist())
        if i + 1 >= max_batches:
            break
    hist = {int(b): int((np.asarray(all_bits) == b).sum())
            for b in range(2, 9)}
    return {"rounded_map_spatial_std_mean": float(np.mean(stds)),
            "rounded_map_spatial_std_max": float(np.max(stds)),
            "continuous_map_spatial_std_mean": float(np.mean(cont_stds)),
            "complexity_map_spatial_std_mean": float(np.mean(cplx_stds)),
            "bit_histogram": hist}


def run(img_size=640, epochs=60, n_images=192, batch_size=16,
        variant="yolov8n", root="outputs/quality_evidence_v2", seed=0,
        kd_epochs=0, fp_epochs=None, n_val=None, lr=2e-3,
        target_bits=4.0, arms="abcm", fp_ckpt=None, lambda_smooth=0.1,
        monotone_param="softplus", min_bits=2, max_bits=8,
        dataset="v3", matched_bits=None, anneal_frac=0.5):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..calibrate import calibrate
    from ..data.dataset import (
        DataLoader,
        YOLODataset,
        load_dataset_yaml,
        make_synthetic_dataset_v2,
        make_synthetic_dataset_v3,
    )
    from ..models import MCAQYOLO
    from ..train import Trainer, export_teacher_from_ckpt
    from ..utils.evaluation import evaluate_quantization_impact
    from ..utils.model_utils import tolerant_restore

    # v2: 8 appearance-defined classes; v3 (default, VERDICT r4 item 2):
    # 16 classes with color as a nuisance, small objects, occlusion,
    # distractor shapes — unsaturated FP headroom
    n_classes = {"v2": 8, "v3": 16}[dataset]
    n_val = n_val or max(batch_size, n_images // 4)
    fp_epochs = fp_epochs or epochs

    # Fail fast on invalid arm combinations: arms C/M and the KD stage all
    # need an FP checkpoint, which comes from arm A in this run or from
    # --fp-ckpt.  Catching this here instead of after arm B saves hours.
    needs_fp = ("c" in arms) or ("m" in arms) or kd_epochs > 0
    if needs_fp and "a" not in arms and fp_ckpt is None:
        raise ValueError(
            f"arms={arms!r}"
            + (f" with kd_epochs={kd_epochs}" if kd_epochs else "")
            + " requires an FP checkpoint: include 'a' in --arms or pass"
            " --fp-ckpt <path to a trained FP baseline checkpoint>")
    if fp_ckpt is not None and not Path(fp_ckpt).exists():
        raise FileNotFoundError(f"--fp-ckpt not found: {fp_ckpt}")
    if "m" in arms and "b" not in arms and matched_bits is None:
        raise ValueError("arm 'm' (matched-budget PTQ) pins its uniform bit"
                         " width to arm B's achieved budget: include 'b' in"
                         " --arms or pass --matched-bits explicitly")

    root = Path(root).resolve()
    root.mkdir(parents=True, exist_ok=True)
    make_ds = {"v2": make_synthetic_dataset_v2,
               "v3": make_synthetic_dataset_v3}[dataset]
    yaml_path = make_ds(
        str(root / "data"), n_images=n_images, img_size=img_size,
        n_val=n_val, seed=seed,
    )

    def base_config(output_dir, n_epochs):
        warmup = max(2, n_epochs // 6)
        transition = max(warmup + 2, n_epochs // 2)
        # anneal-horizon decoupling (VERDICT r4 item 1): complete the
        # alpha_t + target-bits anneals at anneal_frac of the run so the
        # saturation gate reaches full strength near mid-training and the
        # model trains at deployment temperature for the back half.
        # exp_exact lands the target-bits schedule ON target instead of
        # plateauing ~0.2 bits above it.  anneal_frac=1.0 restores the
        # reference-shaped full-run anneal.
        anneal = max(transition, int(round(n_epochs * anneal_frac)))
        return {
            "model": {"name": variant, "num_classes": n_classes,
                      "teacher_path": None},
            # v3's objects go down to ~5% of the image side; mosaic halves
            # object scale again, which at this budget pushes small-object
            # AP to the floor — so v3 runs with reduced mosaic probability
            "data": {"yaml_path": yaml_path, "img_size": img_size,
                     "max_boxes": 16, "num_workers": 2,
                     # device-resident pipeline: over the single-admission
                     # tunnel, per-batch pixel transfer is ~10 s/step; the
                     # HBM-banked pipeline ships only augmentation plans
                     # (data/device_pipeline.py) and was measured at
                     # ~100x the epoch rate of the host path on this host
                     "device_pipeline": True,
                     "mosaic_p": 0.25 if dataset == "v3" else 0.5},
            "epochs": n_epochs,
            "batch_size": batch_size,
            "learning_rate": lr,
            # min/max_bits are protocol knobs: capping max_bits (e.g. 3)
            # forces the allocation into the damaging regime where a KD
            # delta is resolvable — at the default 2..8 range the lambda_1
            # equilibrium settles near 4.5-4.8 bits, where quantization
            # costs nothing and KD-vs-no-KD deltas are pure noise (see
            # PARITY.md "Lbit/lambda_1 equilibrium").
            "quantization": {"min_bits": min_bits, "max_bits": max_bits,
                             "target_bits": target_bits, "grid_size": 8,
                             "bit_mapping": "mlp",
                             "monotone_param": monotone_param,
                             "normalize_complexity": True},
            "curriculum": {"enabled": True, "warmup_epochs": warmup,
                           "transition_epochs": transition,
                           "initial_temperature": 10.0,
                           "lambda_smooth": lambda_smooth,
                           "anneal_epochs": anneal,
                           "budget_anneal": "exp_exact",
                           "budget_controller": True},
            "distillation": {"enabled": False},
            "training": {"map_interval": max(1, n_epochs // 8), "amp": True},
            "seed": seed,
            "output_dir": str(output_dir),
        }

    table = {"config": {"variant": variant, "img_size": img_size,
                        "epochs": epochs, "fp_epochs": fp_epochs,
                        "n_images": n_images, "n_val": n_val, "seed": seed,
                        "target_bits": target_bits, "arms": arms,
                        "min_bits": min_bits, "max_bits": max_bits,
                        "lambda_smooth": lambda_smooth,
                        "monotone_param": monotone_param,
                        "anneal_frac": anneal_frac,
                        "budget_anneal": "exp_exact",
                        "n_classes": n_classes,
                        "dataset": f"synthetic_{dataset}"}}
    t0 = time.time()
    fp_arm = mcaq_arm = None
    mcaq_trainer = None

    def make_val_loader():
        """Standalone val loader (when neither arm A nor B trained here)."""
        data = load_dataset_yaml(yaml_path)
        # drop_last=False: must match Trainer.val_loader so split-invocation
        # arms (--arms c --fp-ckpt ...) evaluate the SAME val subset as arms
        # trained in another invocation — otherwise cross-arm mAP deltas
        # compare different image sets when n_val % batch != 0.
        from ..data.device_pipeline import DevicePipeline

        return DevicePipeline(
            YOLODataset(data["val"], img_size, 16, augment=False)
        ).loader(batch_size, shuffle=False, drop_last=False, augment=False)

    # ---------------- arm A: FP32-trained baseline -----------------------
    if "a" in arms:
        fp_cfg = base_config(root / "train_fp", fp_epochs)
        # pin the curriculum to Stage 1 for the whole run: quantization never
        # activates, loss is pure detection — a true FP baseline
        fp_cfg["curriculum"]["warmup_epochs"] = fp_epochs + 1
        fp_cfg["curriculum"]["transition_epochs"] = fp_epochs + 2
        fp_trainer = Trainer(fp_cfg)
        fp_res = fp_trainer.train()
        fp_vars = fp_trainer._variables()
        fp_arm = _eval_quantized_arm(fp_trainer.model, fp_vars,
                                     fp_trainer.val_loader, n_classes,
                                     quantize=False)
        fp_arm["best_map50_during_training"] = fp_res["best_map50"]
        fp_arm["wall_time_s"] = round(time.time() - t0, 1)
        table["fp_trained_arm"] = fp_arm
        fp_ckpt = root / "train_fp" / (
            "best.ckpt" if (root / "train_fp" / "best.ckpt").exists()
            else "last.ckpt")
    elif fp_ckpt is not None:
        # reuse a previously-trained arm-A checkpoint (equal-budget KD /
        # spread arms don't re-pay the FP baseline's wall-clock)
        fp_ckpt = Path(fp_ckpt)

    # ---------------- arm B: MCAQ-trained --------------------------------
    if "b" in arms:
        t1 = time.time()
        mcaq_cfg = base_config(root / "train_mcaq", epochs)
        mcaq_trainer = Trainer(mcaq_cfg)
        mcaq_res = mcaq_trainer.train()
        mcaq_vars = mcaq_trainer._variables()
        # deploy at the trained bit_scale trim (1.0 when controller off)
        deploy_t = float(mcaq_trainer.curriculum.bit_scale)
        mcaq_arm = _eval_quantized_arm(mcaq_trainer.model, mcaq_vars,
                                       mcaq_trainer.val_loader, n_classes,
                                       temperature=deploy_t, quantize=True)
        mcaq_arm["compression"] = round(
            32.0 / max(mcaq_arm["avg_bits"], 1e-9), 2)
        mcaq_arm["deploy_temperature"] = deploy_t
        mcaq_arm["best_map50_during_training"] = mcaq_res["best_map50"]
        mcaq_arm.update(_deployed_bitmap_stats(
            mcaq_trainer.model, mcaq_vars, mcaq_trainer.val_loader,
            temperature=deploy_t))
        mcaq_arm["wall_time_s"] = round(time.time() - t1, 1)
        table["mcaq_trained_arm"] = mcaq_arm

    # ---------------- arms C + M: post-hoc quantized FP ------------------
    def _posthoc_eval(**mapper_kwargs):
        """Overlay arm A's FP weights into an MCAQ template, EMA-calibrate,
        evaluate quantized.  warn=False: a PLAIN FP checkpoint leaves the
        quantizer/mapper keys at their initialized values by design (that
        is what "post-hoc" means here)."""
        ph_model = MCAQYOLO(variant=variant, num_classes=n_classes,
                            grid_size=8, normalize_complexity=True,
                            **mapper_kwargs)
        dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
        ph_vars = ph_model.init(jax.random.PRNGKey(0), dummy, training=False)
        ph_vars = tolerant_restore(ph_vars, fp_ckpt, warn=False)
        from ..data.device_pipeline import DevicePipeline

        train_dir = load_dataset_yaml(yaml_path)["train"]
        calib_loader = DevicePipeline(
            YOLODataset(train_dir, img_size, 16, augment=False)
        ).loader(batch_size, shuffle=False)
        ph_vars = calibrate(ph_model, ph_vars, calib_loader,
                            num_images=min(n_images, 256))
        val_loader = (mcaq_trainer.val_loader if mcaq_trainer is not None
                      else make_val_loader())
        arm = _eval_quantized_arm(ph_model, ph_vars, val_loader, n_classes,
                                  quantize=True)
        arm["compression"] = round(32.0 / max(arm["avg_bits"], 1e-9), 2)
        return arm

    if "c" in arms:
        t2 = time.time()
        posthoc_arm = _posthoc_eval(bit_mapping="linear")
        posthoc_arm["wall_time_s"] = round(time.time() - t2, 1)
        table["posthoc_quant_arm"] = posthoc_arm

        # -------- deltas (the BASELINE quality contract) -----------------
        if fp_arm is not None:
            table["delta_posthoc_vs_fp_map50_95"] = round(
                posthoc_arm["map50_95"] - fp_arm["map50_95"], 4)
        if mcaq_arm is not None:
            table["mcaq_recovers_over_posthoc_map50_95"] = round(
                mcaq_arm["map50_95"] - posthoc_arm["map50_95"], 4)

    # arm M: MATCHED-BUDGET uniform PTQ (VERDICT r4 weak-6) — same FP
    # weights and calibration as arm C, but the bit map is pinned to arm
    # B's achieved average (nearest integer), so the MCAQ-vs-PTQ delta
    # compares equal bit budgets instead of favoring MCAQ with a
    # lower-budget arm.
    if "m" in arms:
        t2m = time.time()
        pin = matched_bits if matched_bits is not None \
            else mcaq_arm["avg_bits"]
        matched_arm = _posthoc_eval(bit_mapping="constant",
                                    constant_bits=float(round(pin)))
        matched_arm["pinned_bits"] = float(round(pin))
        matched_arm["pin_source"] = ("--matched-bits"
                                     if matched_bits is not None
                                     else "arm B achieved avg_bits")
        matched_arm["wall_time_s"] = round(time.time() - t2m, 1)
        table["matched_ptq_arm"] = matched_arm
        if mcaq_arm is not None:
            table["mcaq_vs_matched_ptq_map50_95"] = round(
                mcaq_arm["map50_95"] - matched_arm["map50_95"], 4)
        if fp_arm is not None:
            table["delta_matched_ptq_vs_fp_map50_95"] = round(
                matched_arm["map50_95"] - fp_arm["map50_95"], 4)
    if fp_arm is not None and mcaq_arm is not None:
        table["delta_mcaq_vs_fp_map50_95"] = round(
            mcaq_arm["map50_95"] - fp_arm["map50_95"], 4)

    # raw-map FP-vs-quantized divergence on the MCAQ arm (reference
    # evaluation.py:310-341)
    if mcaq_trainer is not None:
        fwd = jax.jit(
            lambda imgs, q: mcaq_trainer.model.apply(
                mcaq_vars, imgs, temperature=1.0, quantize=q, training=False
            )[0],
            static_argnums=(1,),
        )
        div = evaluate_quantization_impact(
            lambda im: fwd(jnp.asarray(
                im["image"] if isinstance(im, dict) else im), False),
            lambda im: fwd(jnp.asarray(
                im["image"] if isinstance(im, dict) else im), True),
            mcaq_trainer.val_loader, max_batches=2,
        )
        div.pop("per_image", None)
        table["raw_map_divergence"] = div

    # ---------------- KD arm ---------------------------------------------
    if kd_epochs > 0:
        t3 = time.time()
        teacher_path = export_teacher_from_ckpt(
            str(fp_ckpt), str(root / "teacher.ckpt"), variant, n_classes,
            img_size)
        kd_cfg = base_config(root / "train_kd", kd_epochs)
        kd_cfg["model"]["teacher_path"] = teacher_path
        kd_cfg["distillation"] = {"enabled": True}
        kd_trainer = Trainer(kd_cfg)
        kd_res = kd_trainer.train()
        kd_vars = kd_trainer._variables()
        kd_deploy_t = float(kd_trainer.curriculum.bit_scale)
        kd_arm = _eval_quantized_arm(kd_trainer.model, kd_vars,
                                     kd_trainer.val_loader, n_classes,
                                     temperature=kd_deploy_t, quantize=True)
        kd_arm["deploy_temperature"] = kd_deploy_t
        kd_arm["best_map50_during_training"] = kd_res["best_map50"]
        kd_arm.update(_deployed_bitmap_stats(
            kd_trainer.model, kd_vars, kd_trainer.val_loader,
            temperature=kd_deploy_t))
        final = kd_trainer.history[-1] if kd_trainer.history else {}
        kd_arm["final_kd_loss"] = final.get("loss_kd")
        kd_arm["wall_time_s"] = round(time.time() - t3, 1)
        table["kd_arm"] = kd_arm
        if mcaq_arm is not None:
            table["delta_kd_vs_mcaq_map50_95"] = round(
                kd_arm["map50_95"] - mcaq_arm["map50_95"], 4)

    table["wall_time_s"] = round(time.time() - t0, 1)
    return table


def main(argv=None):
    import os

    p = argparse.ArgumentParser()
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--fp-epochs", type=int, default=None)
    p.add_argument("--n-images", type=int, default=192)
    p.add_argument("--n-val", type=int, default=None,
                   help="val images (default max(batch_size, n_images//4))")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--variant", default="yolov8n")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--root", default="outputs/quality_evidence_v2")
    p.add_argument("--out", default=None)
    p.add_argument("--kd-epochs", type=int, default=0,
                   help="also run the FP-teacher-export + KD-student arm")
    p.add_argument("--target-bits", type=float, default=4.0)
    p.add_argument("--arms", default="abcm",
                   help="which arms to run (subset of 'abcm': a=FP-trained, "
                        "b=MCAQ-trained, c=post-hoc linear PTQ, m=matched-"
                        "budget uniform PTQ; arms needing the FP ckpt can "
                        "reuse one via --fp-ckpt)")
    p.add_argument("--dataset", default="v3", choices=["v2", "v3"],
                   help="synthetic dataset generation (v3 = headroom: 16 "
                        "nuisance-color classes, small objects, occlusion)")
    p.add_argument("--matched-bits", type=float, default=None,
                   help="pin arm m's uniform bit width explicitly (default: "
                        "arm B's achieved avg_bits)")
    p.add_argument("--anneal-frac", type=float, default=0.5,
                   help="fraction of the run over which alpha_t/target-bits "
                        "anneal completes (1.0 = reference full-run anneal)")
    p.add_argument("--fp-ckpt", default=None,
                   help="existing arm-A checkpoint to reuse when 'a' is "
                        "not in --arms")
    p.add_argument("--lambda-smooth", type=float, default=0.1)
    p.add_argument("--monotone-param", default="softplus",
                   choices=["abs", "softplus"])
    p.add_argument("--min-bits", type=int, default=2)
    p.add_argument("--max-bits", type=int, default=8,
                   help="cap the bit range (e.g. 3) to force the damaging "
                        "regime for discriminative KD-vs-no-KD runs")
    args = p.parse_args(argv)
    if os.environ.get("QUALITY_ALLOW_CPU", "0") != "1":
        # The axon tunnel admits ONE process: when another holds the chip,
        # backend init raises and jax silently lands on cpu — which would
        # run the whole multi-hour campaign on the 1-core host and poison
        # every wall-time/throughput figure.  Block until the TPU is
        # actually acquired (or fail loudly) — AFTER argparse, so --help
        # and flag errors return instantly.  QUALITY_ALLOW_CPU=1 opts
        # into CPU runs (tests, tunnel-down forensics).
        from ..utils.sync import require_tpu

        require_tpu(retries=30, wait_s=10.0)
    table = run(args.img_size, args.epochs, args.n_images,
                batch_size=args.batch_size, variant=args.variant,
                n_val=args.n_val,
                root=args.root, seed=args.seed, kd_epochs=args.kd_epochs,
                fp_epochs=args.fp_epochs, target_bits=args.target_bits,
                monotone_param=args.monotone_param,
                arms=args.arms, fp_ckpt=args.fp_ckpt,
                lambda_smooth=args.lambda_smooth,
                min_bits=args.min_bits, max_bits=args.max_bits,
                dataset=args.dataset, matched_bits=args.matched_bits,
                anneal_frac=args.anneal_frac)
    s = json.dumps(table, indent=2, default=float)
    print(s)
    if args.out:
        Path(args.out).write_text(s + "\n")


if __name__ == "__main__":
    main()
