"""Quality-parity evidence run (BASELINE quality contract; VERDICT r1 item 4).

Trains MCAQ-YOLO at REALISTIC resolution (640px, full curriculum, MLP bit
mapper, mosaic augmentation) on a synthetic photographic-statistics dataset,
then reports the quality table the BASELINE asks for:

    * mAP@0.5 and mAP@0.5:0.95 with quantization ON (the deployed path)
      vs quantization OFF (FP arm) — same weights, same data, same seed
    * mean bit budget + compression ratio (32 / avg_bits)
    * FP-vs-quantized raw-map divergence (reference evaluation.py:310-341)

The reference's own full trainer cannot run here (it requires the
`ultralytics` package), so the torch-side quality anchor is the e2e
inference parity test (tests/test_e2e_mcaq_parity.py: reference quantizer +
torch detector == this framework, detection- and mAP-level); this script
supplies the at-scale quantized-vs-FP numbers on top of it.

Usage: python -m mcaq_yolo_tpu.scripts.quality_evidence
           [--img-size 640] [--epochs 30] [--n-images 96] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def run(img_size=640, epochs=30, n_images=96, n_classes=8, batch_size=16,
        variant="yolov8n", root="outputs/quality_evidence", seed=0,
        kd_epochs=0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.dataset import DataLoader, YOLODataset, make_synthetic_dataset
    from ..train import Trainer, export_teacher_from_ckpt
    from ..utils.evaluation import evaluate_quantization_impact

    root = Path(root).resolve()  # dataset yaml stores paths relative to it
    root.mkdir(parents=True, exist_ok=True)
    yaml_path = make_synthetic_dataset(
        str(root / "data"), n_images=n_images, img_size=img_size,
        n_classes=n_classes,
    )

    warmup = max(2, epochs // 6)
    transition = max(warmup + 2, epochs // 2)
    config = {
        "model": {"name": variant, "num_classes": n_classes,
                  "teacher_path": None},
        "data": {"yaml_path": yaml_path, "img_size": img_size,
                 "max_boxes": 32, "num_workers": 2, "mosaic_p": 1.0},
        "epochs": epochs,
        "batch_size": batch_size,
        "learning_rate": 2e-3,
        "quantization": {"min_bits": 2, "max_bits": 8, "target_bits": 4.0,
                         "grid_size": 8, "bit_mapping": "mlp"},
        "curriculum": {"enabled": True, "warmup_epochs": warmup,
                       "transition_epochs": transition,
                       "initial_temperature": 10.0},
        "distillation": {"enabled": False},
        "training": {"map_interval": max(1, epochs // 6), "amp": True},
        "seed": seed,
        "output_dir": str(root / "train"),
    }

    t0 = time.time()
    trainer = Trainer(config)
    train_res = trainer.train()

    # final eval, both arms, at deployment temperature
    variables = trainer._variables()

    def eval_arm(quantize):
        preds, targets, bits = [], [], []
        from ..utils.evaluation import (
            compute_map,
            compute_map50_95,
            detections_to_numpy,
            extract_targets_per_image,
        )
        for batch in trainer.val_loader:
            images = jnp.asarray(batch["image"])
            det = jax.device_get(trainer.eval_step(
                variables, images, jnp.float32(1.0), quantize=quantize))
            b, s, c, v, avg_bits = det
            preds.extend(detections_to_numpy(b, s, c, v))
            targets.extend(extract_targets_per_image(batch))
            bits.append(float(avg_bits))
        m50 = compute_map(preds, targets, 0.5)["map"]
        m5095 = compute_map50_95(preds, targets)["map50_95"]
        return {"map50": m50, "map50_95": m5095,
                "avg_bits": float(np.mean(bits)) if quantize else 32.0}

    q_arm = eval_arm(True)
    fp_arm = eval_arm(False)

    # raw-map divergence (reference evaluation.py:310-341)
    fwd = jax.jit(
        lambda imgs, q: trainer.model.apply(
            variables, imgs, temperature=1.0, quantize=q, training=False
        )[0],
        static_argnums=(1,),
    )
    div_loader = DataLoader(
        YOLODataset(trainer.val_dataset.img_dir, img_size, 32, augment=False),
        batch_size, shuffle=False,
    )
    div = evaluate_quantization_impact(
        lambda im: fwd(jnp.asarray(im), False),
        lambda im: fwd(jnp.asarray(im), True),
        div_loader, max_batches=4,
    )
    div.pop("per_image", None)

    table = {
        "config": {"variant": variant, "img_size": img_size,
                   "epochs": epochs, "n_images": n_images, "seed": seed},
        "wall_time_s": round(time.time() - t0, 1),
        "fp32_arm": fp_arm,
        "mcaq_arm": {**q_arm,
                     "compression": round(32.0 / max(q_arm["avg_bits"], 1e-9), 2)},
        "delta_map50_95": round(q_arm["map50_95"] - fp_arm["map50_95"], 4),
        "raw_map_divergence": div,
        "best_map50_during_training": train_res["best_map50"],
    }

    if kd_epochs > 0:
        # full reference KD workflow: export the trained detector as the
        # FP32 teacher, then train a KD student (logit + feature
        # distillation, reference train.py:83-94, 582-610)
        ckpt = root / "train" / ("best.ckpt" if (root / "train" / "best.ckpt").exists() else "last.ckpt")
        teacher_path = export_teacher_from_ckpt(
            str(ckpt), str(root / "teacher.ckpt"), variant,
            n_classes, img_size)
        kd_config = dict(config)
        kd_config["model"] = dict(config["model"], teacher_path=teacher_path)
        kd_config["distillation"] = {"enabled": True}
        kd_config["epochs"] = kd_epochs
        kd_config["output_dir"] = str(root / "train_kd")
        kd_config["curriculum"] = dict(
            config["curriculum"],
            warmup_epochs=max(2, kd_epochs // 6),
            transition_epochs=max(4, kd_epochs // 2),
        )
        t1 = time.time()
        kd_trainer = Trainer(kd_config)
        kd_res = kd_trainer.train()
        final = kd_trainer.history[-1] if kd_trainer.history else {}
        table["kd_arm"] = {
            "epochs": kd_epochs,
            "best_map50": kd_res["best_map50"],
            "final_avg_bits": final.get("avg_bits"),
            "final_kd_loss": final.get("loss_kd"),
            "wall_time_s": round(time.time() - t1, 1),
        }
    return table


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--n-images", type=int, default=96)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--variant", default="yolov8n")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--root", default="outputs/quality_evidence")
    p.add_argument("--out", default=None)
    p.add_argument("--kd-epochs", type=int, default=0,
                   help="also run the teacher-export + KD-student stage")
    args = p.parse_args(argv)
    table = run(args.img_size, args.epochs, args.n_images,
                batch_size=args.batch_size, variant=args.variant,
                root=args.root, seed=args.seed, kd_epochs=args.kd_epochs)
    s = json.dumps(table, indent=2, default=float)
    print(s)
    if args.out:
        Path(args.out).write_text(s)


if __name__ == "__main__":
    main()
