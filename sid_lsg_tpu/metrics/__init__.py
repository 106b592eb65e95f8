from .feature_stats import FeatureStats, ProgressMonitor
from .fid import frechet_distance, compute_fid_from_stats
from .registry import (
    MetricOptions,
    calc_metric,
    is_valid_metric,
    list_valid_metrics,
    register_metric,
    report_metric,
)

__all__ = [
    "FeatureStats",
    "ProgressMonitor",
    "frechet_distance",
    "compute_fid_from_stats",
    "MetricOptions",
    "calc_metric",
    "is_valid_metric",
    "list_valid_metrics",
    "register_metric",
    "report_metric",
]

from . import fid_and_clip  # noqa: E402,F401  (registers fid/clip metrics)
from . import precision_recall  # noqa: E402,F401  (registers pr metric)
from . import hpsv2  # noqa: E402,F401  (registers the working hpsv2 metric)
