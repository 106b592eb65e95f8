"""Streaming feature statistics + progress reporting for metric loops.

Fills the role of the reference's metric feature accumulator
(``metrics/sid_metric_utils.py:112-233``: streaming mean/cov and/or a raw
feature buffer, with a progress line), with two deliberate departures:

- the reference synchronises per-batch with an O(world²) broadcast interleave
  (:152-162, flagged defective in SURVEY.md §2.5); here accumulation is
  process-local and merged once at the end with a single
  ``process_allgather`` (moment sums are order-invariant, so no interleaving
  is needed for mean/cov; raw features are gathered only when a metric truly
  needs them, e.g. precision/recall);
- internals are structured as a second-moment accumulator dataclass plus a
  geometrically-growing flat feature buffer rather than the reference's
  attribute soup, so appends are O(1) amortised with no per-batch list
  bookkeeping.
"""

from __future__ import annotations

import os
import pickle
import time
from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

_SAVE_VERSION = 2


@dataclass
class _Moments:
    """Order-invariant running sums: count, Σx and Σxᵀx in float64."""

    dim: int
    count: int = 0
    sum1: np.ndarray = field(init=False)
    sum2: np.ndarray = field(init=False)

    def __post_init__(self) -> None:
        self.sum1 = np.zeros(self.dim, np.float64)
        self.sum2 = np.zeros((self.dim, self.dim), np.float64)

    def add(self, x: np.ndarray) -> None:
        x64 = x.astype(np.float64, copy=False)
        self.count += x64.shape[0]
        self.sum1 += x64.sum(axis=0)
        self.sum2 += x64.T @ x64

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        mean = self.sum1 / self.count
        cov = self.sum2 / self.count - np.outer(mean, mean)
        return mean, cov


class _GrowBuffer:
    """Flat (N, dim) float32 store that doubles capacity on demand."""

    def __init__(self, dim: int):
        self._data = np.empty((256, dim), np.float32)
        self._n = 0

    def extend(self, x: np.ndarray) -> None:
        need = self._n + x.shape[0]
        if need > self._data.shape[0]:
            cap = max(need, 2 * self._data.shape[0])
            grown = np.empty((cap, self._data.shape[1]), np.float32)
            grown[: self._n] = self._data[: self._n]
            self._data = grown
        self._data[self._n : need] = x
        self._n = need

    def view(self) -> np.ndarray:
        return self._data[: self._n]


class FeatureStats:
    """Streams detector feature batches into moments and/or a raw buffer."""

    def __init__(self, capture_all: bool = False, capture_mean_cov: bool = False,
                 max_items: Optional[int] = None):
        self.capture_all = capture_all
        self.capture_mean_cov = capture_mean_cov
        self.max_items = max_items
        self._moments: Optional[_Moments] = None
        self._buffer: Optional[_GrowBuffer] = None

    # ---------------------------------------------------------------- append
    @property
    def num_items(self) -> int:
        if self._moments is not None:
            return self._moments.count
        return self._buffer._n if self._buffer else 0

    @property
    def num_features(self) -> Optional[int]:
        if self._moments is not None:
            return self._moments.dim
        if self._buffer is not None:
            return self._buffer.view().shape[1]
        return None

    def is_full(self) -> bool:
        return self.max_items is not None and self.num_items >= self.max_items

    def append(self, x: np.ndarray) -> None:
        x = np.asarray(x, dtype=np.float32)
        assert x.ndim == 2, f"expected (batch, features), got {x.shape}"
        if self.max_items is not None:
            room = self.max_items - self.num_items
            if room <= 0:
                return
            x = x[:room]
        if self.capture_mean_cov:
            if self._moments is None:
                self._moments = _Moments(x.shape[1])
            self._moments.add(x)
        if self.capture_all:
            if self._buffer is None:
                self._buffer = _GrowBuffer(x.shape[1])
            self._buffer.extend(x)

    # --------------------------------------------------------------- results
    def get_all(self) -> np.ndarray:
        assert self.capture_all
        if self._buffer is None:
            return np.zeros((0, 0), np.float32)
        return self._buffer.view().copy()

    def get_mean_cov(self) -> Tuple[np.ndarray, np.ndarray]:
        assert self.capture_mean_cov and self._moments is not None
        return self._moments.finalize()

    # ------------------------------------------------------------ multihost
    def merge_across_processes(self) -> None:
        """One collective merge at the end (replaces per-batch interleave)."""
        import jax

        if jax.process_count() <= 1:
            return
        from jax.experimental import multihost_utils as mhu

        counts = np.asarray(mhu.process_allgather(np.asarray([self.num_items])))
        total = int(counts.sum())
        if self.max_items is not None:
            total = min(total, self.max_items)
        if self.capture_mean_cov and self._moments is not None:
            m = self._moments
            m.sum1 = np.asarray(mhu.process_allgather(m.sum1)).sum(axis=0)
            m.sum2 = np.asarray(mhu.process_allgather(m.sum2)).sum(axis=0)
            m.count = total
        if self.capture_all and self._buffer is not None:
            gathered = np.asarray(mhu.process_allgather(self._buffer.view()))
            fresh = _GrowBuffer(gathered.shape[-1])
            fresh.extend(gathered.reshape(-1, gathered.shape[-1])[:total])
            self._buffer = fresh

    # ---------------------------------------------------------------- cache
    def save(self, path: str) -> None:
        payload = {
            "version": _SAVE_VERSION,
            "capture_all": self.capture_all,
            "capture_mean_cov": self.capture_mean_cov,
            "max_items": self.max_items,
            "count": self._moments.count if self._moments else None,
            "sum1": self._moments.sum1 if self._moments else None,
            "sum2": self._moments.sum2 if self._moments else None,
            "features": self._buffer.view() if self._buffer else None,
        }
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)  # atomic, same guarantee as reference cache writes

    @classmethod
    def load(cls, path: str) -> "FeatureStats":
        with open(path, "rb") as f:
            d = pickle.load(f)
        obj = cls(capture_all=d["capture_all"], capture_mean_cov=d["capture_mean_cov"],
                  max_items=d["max_items"])
        if d.get("sum1") is not None:
            obj._moments = _Moments(d["sum1"].shape[0])
            obj._moments.count = d["count"]
            obj._moments.sum1 = d["sum1"]
            obj._moments.sum2 = d["sum2"]
        if d.get("features") is not None:
            obj._buffer = _GrowBuffer(d["features"].shape[1])
            obj._buffer.extend(d["features"])
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
