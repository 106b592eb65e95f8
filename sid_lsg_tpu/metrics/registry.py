"""Metric registry, dispatch and jsonl reporting.

Counterpart of reference ``metrics/sid_metric_main.py``: ``@register_metric``
name registry (:31-42), ``calc_metric`` timing/dispatch (:46-61) and
``report_metric`` -> ``metric-{name}.jsonl`` (:80-95).  Multi-host: every
process runs the (process-strided) feature loops; results are identical on
all hosts after the final merge, so no rank-0 broadcast step exists.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Optional

from ..utils.util import EasyDict

_metric_dict: Dict[str, Callable] = {}


def register_metric(fn: Callable) -> Callable:
    assert fn.__name__ not in _metric_dict
    _metric_dict[fn.__name__] = fn
    return fn


def is_valid_metric(metric: str) -> bool:
    return metric in _metric_dict


def list_valid_metrics():
    return list(_metric_dict.keys())


class MetricOptions:
    """Everything a metric needs.

    - ``pipe``: an ``SDPipeline`` whose generator params are the model under
      eval (the reference passes a partial of ``sid_sd_sampler``).
    - ``dataset_path``: prepared COCO eval folder (img+txt pairs).
    - ``detector``: feature extractor ``uint8 (B,H,W,3) -> (B,F)`` for
      FID/PR; defaults to the bundled InceptionV3 port.
    - ``clip``: joint image/text scorer for CLIP score (optional).
    """

    def __init__(
        self,
        pipe=None,
        dataset_path: Optional[str] = None,
        detector: Optional[Callable] = None,
        clip=None,
        cache_dir: Optional[str] = None,
        batch_size: int = 16,
        num_gen: int = 30000,
        init_timestep: int = 625,
        num_steps_eval: int = 1,
        resolution: int = 256,
        seed: int = 0,
        verbose: bool = True,
        progress=None,
    ):
        self.pipe = pipe
        self.dataset_path = dataset_path
        self._detector = detector
        self.clip = clip
        self.cache_dir = cache_dir or os.path.join(
            os.path.expanduser("~"), ".cache", "sid_lsg_tpu"
        )
        self.batch_size = batch_size
        self.num_gen = num_gen
        self.init_timestep = init_timestep
        self.num_steps_eval = num_steps_eval
        self.resolution = resolution
        self.seed = seed
        self.verbose = verbose
        self.progress = progress

    @property
    def detector(self) -> Callable:
        if self._detector is None:
            from .detectors import inception_detector

            self._detector = inception_detector()
        return self._detector


def calc_metric(metric: str, **kwargs: Any) -> EasyDict:
    assert is_valid_metric(metric), f"unknown metric {metric!r}"
    opts = kwargs.pop("opts", None) or MetricOptions(**kwargs)
    start = time.time()
    results = _metric_dict[metric](opts)
    total_time = time.time() - start
    return EasyDict(
        results=EasyDict(results),
        metric=metric,
        total_time=total_time,
        total_time_str=_fmt_time(total_time),
        num_gen=opts.num_gen,
    )


def report_metric(result_dict: EasyDict, run_dir: Optional[str] = None,
                  snapshot_pkl: Optional[str] = None) -> None:
    metric = result_dict["metric"]
    if snapshot_pkl is not None and run_dir is not None:
        snapshot_pkl = os.path.relpath(snapshot_pkl, run_dir)
    jsonl_line = json.dumps(
        dict(result_dict, snapshot_pkl=snapshot_pkl, timestamp=time.time())
    )
    print(jsonl_line)
    if run_dir is not None and os.path.isdir(run_dir):
        with open(os.path.join(run_dir, f"metric-{metric}.jsonl"), "at") as f:
            f.write(jsonl_line + "\n")


def _fmt_time(seconds: float) -> str:
    from ..utils.util import format_time

    return format_time(seconds)
