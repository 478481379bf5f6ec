"""Data pipeline: YOLO-txt dataset, letterbox, augmentation, fixed-shape
padded batches (jit-compatible replacement for the Ultralytics pipeline the
reference uses, reference train.py:302-371)."""

from .dataset import (  # noqa: F401
    YOLODataset,
    ImageFolderDataset,
    DataLoader,
    letterbox,
    load_dataset_yaml,
    compute_dataset_complexity,
    create_complexity_balanced_sampler,
    make_synthetic_dataset,
    make_synthetic_dataset_v2,
    make_synthetic_dataset_v3,
    score_image_folder,
)
