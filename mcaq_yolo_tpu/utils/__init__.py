"""Utilities: evaluation (mAP), dataset complexity scoring, visualization,
repro/seeding, model statistics."""

from .repro import set_global_seed  # noqa: F401
from .evaluation import compute_map, evaluate_mcaq_yolo  # noqa: F401


def __getattr__(name):  # lazy: matplotlib-dependent visualization
    if name in (
        "visualize_complexity_map",
        "visualize_bit_allocation",
        "plot_training_curves",
        "visualize_complexity_vs_performance",
        "create_summary_report",
    ):
        from . import visualization

        return getattr(visualization, name)
    if name in ("compute_dataset_complexity", "create_complexity_balanced_sampler"):
        from ..data import dataset

        return getattr(dataset, name)
    raise AttributeError(name)
