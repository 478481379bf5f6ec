"""Minimal dict-config Trainer usage + post-train inference check
(reference examples/train_examples.py).  Runs end-to-end on a synthetic
dataset — no downloads needed."""

import tempfile
from pathlib import Path


def main():
    from mcaq_yolo_tpu.data import make_synthetic_dataset
    from mcaq_yolo_tpu.train import Trainer

    root = tempfile.mkdtemp(prefix="mcaq_example_")
    yaml_path = make_synthetic_dataset(root, n_images=16, img_size=128,
                                       n_classes=4)

    config = {
        "model": {"name": "yolov8n", "num_classes": 4, "teacher_path": None},
        "data": {"yaml_path": yaml_path, "img_size": 128, "max_boxes": 16},
        "epochs": 3,
        "batch_size": 4,
        "learning_rate": 1e-3,
        "quantization": {
            "min_bits": 2, "max_bits": 8, "target_bits": 4.0,
            "grid_size": 8, "bit_mapping": "linear",
        },
        "curriculum": {
            "enabled": True, "warmup_epochs": 1, "transition_epochs": 2,
            "initial_temperature": 10.0,
        },
        "distillation": {"enabled": False},
        "training": {"map_interval": 1},
        "seed": 0,
        "output_dir": str(Path(root) / "outputs"),
    }

    trainer = Trainer(config)
    results = trainer.train()
    print("training:", results)

    # inference on one image with the final checkpoint
    from mcaq_yolo_tpu.inference import Predictor
    import numpy as np
    from PIL import Image

    ckpt = Path(config["output_dir"]) / "last.ckpt"
    predictor = Predictor(str(ckpt), num_classes=4, variant="yolov8n",
                          img_size=128, warmup=False)
    img_file = next(Path(root, "images", "train").glob("*.jpg"))
    out = predictor.predict(np.asarray(Image.open(img_file)))
    print(f"inference: {len(out['detections'])} detections, "
          f"{out['inference_time_ms']:.1f} ms, avg_bits {out['avg_bits']:.2f}")


if __name__ == "__main__":
    main()
