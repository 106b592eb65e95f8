"""Streaming feature statistics + progress reporting for metric loops.

Counterpart of reference ``metrics/sid_metric_utils.py``'s ``FeatureStats``
(:112 — raw feature buffer and/or accumulated mean/cov) and
``ProgressMonitor`` (:192).  The reference synchronises per-batch with an
O(world²) broadcast interleave (:152-162, flagged defective in SURVEY.md
§2.5); here accumulation is process-local and merged once at the end with a
single ``process_allgather`` (moment sums are order-invariant, so no
interleaving is needed for mean/cov; ``capture_all`` gathers raw features
only when a metric truly needs them, e.g. precision/recall).
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


class FeatureStats:
    def __init__(self, capture_all: bool = False, capture_mean_cov: bool = False,
                 max_items: Optional[int] = None):
        self.capture_all = capture_all
        self.capture_mean_cov = capture_mean_cov
        self.max_items = max_items
        self.num_items = 0
        self.num_features: Optional[int] = None
        self.all_features: list = []
        self.raw_mean: Optional[np.ndarray] = None
        self.raw_cov: Optional[np.ndarray] = None

    def set_num_features(self, num_features: int) -> None:
        if self.num_features is not None:
            assert num_features == self.num_features
        else:
            self.num_features = num_features
            self.raw_mean = np.zeros(num_features, dtype=np.float64)
            self.raw_cov = np.zeros((num_features, num_features), dtype=np.float64)

    def is_full(self) -> bool:
        return self.max_items is not None and self.num_items >= self.max_items

    def append(self, x: np.ndarray) -> None:
        x = np.asarray(x, dtype=np.float32)
        assert x.ndim == 2
        if self.max_items is not None:
            if self.num_items >= self.max_items:
                return
            x = x[: self.max_items - self.num_items]
        self.set_num_features(x.shape[1])
        self.num_items += x.shape[0]
        if self.capture_all:
            self.all_features.append(x)
        if self.capture_mean_cov:
            x64 = x.astype(np.float64)
            self.raw_mean += x64.sum(axis=0)
            self.raw_cov += x64.T @ x64

    def get_all(self) -> np.ndarray:
        assert self.capture_all
        if not self.all_features:
            return np.zeros((0, self.num_features or 0), np.float32)
        return np.concatenate(self.all_features, axis=0)

    def get_mean_cov(self):
        assert self.capture_mean_cov and self.num_items > 0
        mean = self.raw_mean / self.num_items
        cov = self.raw_cov / self.num_items - np.outer(mean, mean)
        return mean, cov

    # ------------------------------------------------------------ multihost
    def merge_across_processes(self) -> None:
        """One collective merge at the end (replaces per-batch interleave)."""
        import jax

        if jax.process_count() <= 1:
            return
        from jax.experimental import multihost_utils as mhu

        counts = np.asarray(mhu.process_allgather(np.asarray([self.num_items])))
        if self.capture_mean_cov:
            self.raw_mean = np.asarray(mhu.process_allgather(self.raw_mean)).sum(axis=0)
            self.raw_cov = np.asarray(mhu.process_allgather(self.raw_cov)).sum(axis=0)
        if self.capture_all:
            feats = self.get_all()
            gathered = np.asarray(mhu.process_allgather(feats))
            self.all_features = [g for g in gathered]
        self.num_items = int(counts.sum())
        if self.max_items is not None:
            self.num_items = min(self.num_items, self.max_items)

    # ---------------------------------------------------------------- cache
    def save(self, path: str) -> None:
        import os
        import pickle

        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(self.__dict__, f)
        os.replace(tmp, path)  # atomic (reference sid_metric_utils.py:285-287)

    @classmethod
    def load(cls, path: str) -> "FeatureStats":
        import pickle

        with open(path, "rb") as f:
            d = pickle.load(f)
        obj = cls()
        obj.__dict__.update(d)
        return obj


class ProgressMonitor:
    """ms/item progress line (reference sid_metric_utils.py:192-233)."""

    def __init__(self, tag: Optional[str] = None, num_items: Optional[int] = None,
                 verbose: bool = True, flush_interval: float = 2.0):
        self.tag = tag
        self.num_items = num_items
        self.verbose = verbose
        self.flush_interval = flush_interval
        self.start_time = time.time()
        self.batch_time = self.start_time
        self.batch_items = 0
        self._last_flush = 0.0

    def update(self, cur_items: int) -> None:
        now = time.time()
        if not self.verbose or now - self._last_flush < self.flush_interval:
            self.batch_time, self.batch_items = now, cur_items
            return
        total_time = now - self.start_time
        time_per_item = (
            (now - self.batch_time) / max(cur_items - self.batch_items, 1)
        )
        frac = f"{cur_items}/{self.num_items}" if self.num_items else str(cur_items)
        print(f"{self.tag or 'progress'} items {frac:<14s} time {total_time:<8.1f}s "
              f"ms/item {time_per_item * 1000:.2f}")
        self._last_flush = now
        self.batch_time, self.batch_items = now, cur_items
