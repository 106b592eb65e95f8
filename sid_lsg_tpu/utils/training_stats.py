"""Distributed 3-moment stat counters.

TPU-native counterpart of the reference's ``torch_utils/training_stats.py``
(moments [n, sum(x), sum(x^2)] per name, reference lines 22-98; cross-rank sync
via one all_reduce at 254-255).  In single-controller JAX there is one python
process per *host*, not per chip: in-step metrics are already globally reduced
by XLA (``psum``/``pmean`` inside the jitted step), so what this module syncs
is the *host-side* accumulation across processes, using
``multihost_utils.process_allgather`` when more than one process exists.

API shape preserved: ``report(name, value)``, ``report0``, ``Collector`` with
``update()/mean()/std()/as_dict()``, ``default_collector``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

import numpy as np

_num_moments = 3  # [num_items, sum_x, sum_x2]
_counters: Dict[str, np.ndarray] = {}
_rank0 = True
_sync_enabled = False


def init_multiprocessing(rank: int = 0, sync: bool = False) -> None:
    """Wire cross-process sync (reference training_stats.py:33)."""
    global _rank0, _sync_enabled
    _rank0 = rank == 0
    _sync_enabled = sync


def _accumulate(name: str, moments: np.ndarray) -> None:
    if name not in _counters:
        _counters[name] = np.zeros(_num_moments, dtype=np.float64)
    _counters[name] += moments


def report(name: str, value: Any) -> Any:
    """Accumulate scalar(s) into the named counter; returns value unchanged."""
    if value is None:
        return value
    arr = np.asarray(value, dtype=np.float64).reshape(-1)
    arr = arr[np.isfinite(arr)]
    if arr.size:
        _accumulate(name, np.array([arr.size, arr.sum(), np.square(arr).sum()]))
    return value


def report0(name: str, value: Any) -> Any:
    """Accumulate only on process 0 (reference training_stats.py:102)."""
    if _rank0:
        report(name, value)
    return value


def _sync(names: List[str]) -> Dict[str, np.ndarray]:
    """Flush deltas, summing across processes in one gather.

    The reference does one fused all_reduce over all counters
    (training_stats.py:254-255); here a single ``process_allgather`` over the
    stacked delta matrix plays the same role over DCN.
    """
    if not names:
        return {}
    deltas = np.stack([_counters.get(n, np.zeros(_num_moments)) for n in names])
    for n in names:
        _counters[n] = np.zeros(_num_moments, dtype=np.float64)
    if _sync_enabled:
        import jax
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            gathered = multihost_utils.process_allgather(deltas)
            deltas = np.asarray(gathered).sum(axis=0)
    return {n: deltas[i] for i, n in enumerate(names)}


class Collector:
    """Snapshot view over the counters, regex-filtered (reference :112)."""

    def __init__(self, regex: str = ".*", keep_previous: bool = True):
        self._regex = re.compile(regex)
        self._keep_previous = keep_previous
        self._cumulative: Dict[str, np.ndarray] = {}
        self._moments: Dict[str, np.ndarray] = {}
        self.update()
        self._moments.clear()

    def names(self) -> List[str]:
        return [n for n in _counters if self._regex.fullmatch(n)]

    def update(self) -> None:
        if not self._keep_previous:
            self._moments.clear()
        synced = _sync(self.names())
        for name, delta in synced.items():
            self._cumulative.setdefault(name, np.zeros(_num_moments))
            self._cumulative[name] += delta
            if delta[0] != 0:
                self._moments[name] = delta

    def _get(self, name: str) -> np.ndarray:
        return self._moments.get(name, np.zeros(_num_moments))

    def num(self, name: str) -> int:
        return int(self._get(name)[0])

    def mean(self, name: str) -> float:
        m = self._get(name)
        return float(m[1] / m[0]) if m[0] != 0 else float("nan")

    def std(self, name: str) -> float:
        m = self._get(name)
        if m[0] == 0 or not np.isfinite(m[1]):
            return float("nan")
        if m[0] == 1:
            return 0.0
        mean = m[1] / m[0]
        raw_var = m[2] / m[0]
        return float(np.sqrt(max(raw_var - mean * mean, 0.0)))

    def as_dict(self) -> "EasyDictLike":
        from .util import EasyDict
        stats = EasyDict()
        for name in self.names():
            stats[name] = EasyDict(num=self.num(name), mean=self.mean(name), std=self.std(name))
        return stats

    def __getitem__(self, name: str) -> float:
        return self.mean(name)


default_collector = None


def get_default_collector() -> Collector:
    global default_collector
    if default_collector is None:
        default_collector = Collector()
    return default_collector
