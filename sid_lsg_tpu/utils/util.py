"""Core utilities: EasyDict, tee-logger, dynamic construction, time formatting.

TPU-native counterpart of the reference's ``dnnlib/util.py`` (see
/root/reference/dnnlib/util.py:39,55,138,286,300).  Re-designed, not ported:
no URL/Google-Drive machinery (model weights come from local safetensors /
orbax), but the config-by-import-path pattern and the run-dir logger are kept
because the CLI surface depends on them.
"""

from __future__ import annotations

import importlib
import io
import os
import sys
import types
from typing import Any


class EasyDict(dict):
    """dict with attribute access; the de-facto config object of the CLI."""

    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__  # type: ignore[assignment]

    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(name)


class _Fanout(io.TextIOBase):
    """Text stream that mirrors every write to a list of sinks."""

    def __init__(self, sinks: "list[Any]", autoflush: bool):
        super().__init__()
        self._sinks = sinks
        self._autoflush = autoflush

    def writable(self) -> bool:
        return True

    def write(self, text: str) -> int:
        for sink in self._sinks:
            sink.write(text)
            if self._autoflush:
                sink.flush()
        return len(text)

    def flush(self) -> None:
        for sink in self._sinks:
            sink.flush()


class Logger:
    """Mirror stdout+stderr into a run-dir ``log.txt``.

    Fills the role of the reference's log tee (every run leaves a complete
    ``log.txt``, dnnlib/util.py:55 call sites) but is built differently: the
    two standard streams are swapped for independent :class:`_Fanout` views
    that share one log file handle, and ``close()`` restores whichever of
    them is still ours.  ``file_name=None`` is a no-op logger (console only).
    """

    def __init__(self, file_name: str | None = None, file_mode: str = "a", should_flush: bool = True):
        self._log_file = open(file_name, file_mode) if file_name else None
        self._prev = {"stdout": sys.stdout, "stderr": sys.stderr}
        self._tees: dict[str, _Fanout] = {}
        for name, prev in self._prev.items():
            sinks = [prev] + ([self._log_file] if self._log_file else [])
            tee = _Fanout(sinks, autoflush=should_flush)
            self._tees[name] = tee
            setattr(sys, name, tee)

    def __enter__(self) -> "Logger":
        return self

    def __exit__(self, *_: Any) -> None:
        self.close()

    def close(self) -> None:
        for name, prev in self._prev.items():
            if getattr(sys, name) is self._tees.get(name):
                setattr(sys, name, prev)
        if self._log_file is not None:
            self._log_file.flush()
            self._log_file.close()
            self._log_file = None


def format_time(seconds: float) -> str:
    """Human-readable duration, same buckets as reference dnnlib/util.py:138."""
    s = int(round(seconds))
    if s < 60:
        return f"{s}s"
    if s < 60 * 60:
        return f"{s // 60}m {s % 60:02d}s"
    if s < 24 * 60 * 60:
        return f"{s // (60 * 60)}h {(s // 60) % 60:02d}m {s % 60:02d}s"
    return f"{s // (24 * 60 * 60)}d {(s // (60 * 60)) % 24:02d}h {(s // 60) % 60:02d}m"


# ----------------------------------------------------------------------------
# Registry-by-import-path (reference dnnlib/util.py:286-320): classes and
# functions are selected by dotted string name in configs, so that
# `training_options.json` fully describes a run.

def get_obj_by_name(name: str) -> Any:
    """Resolve 'pkg.module.Obj' (or 'pkg.module.Obj.attr') to a python object."""
    parts = name.split(".")
    for i in range(len(parts), 0, -1):
        try:
            module = importlib.import_module(".".join(parts[:i]))
        except ImportError:
            continue
        obj: Any = module
        try:
            for p in parts[i:]:
                obj = getattr(obj, p)
        except AttributeError:
            continue
        if not isinstance(obj, types.ModuleType):
            return obj
        if i == len(parts):
            return obj
    raise ImportError(f"cannot resolve object by name: {name!r}")


def construct_class_by_name(*args: Any, class_name: str | None = None, **kwargs: Any) -> Any:
    return get_obj_by_name(class_name)(*args, **kwargs)


def call_func_by_name(*args: Any, func_name: str | None = None, **kwargs: Any) -> Any:
    return get_obj_by_name(func_name)(*args, **kwargs)


def make_run_dir(outdir: str, desc: str, dry_run: bool = False) -> str:
    """Pick the next numbered run dir ``{id:05d}-{desc}`` (sid_train.py:286-311)."""
    prev_run_dirs = []
    if os.path.isdir(outdir):
        prev_run_dirs = [x for x in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, x))]
    prev_run_ids = [int(x.split("-")[0]) for x in prev_run_dirs if x.split("-")[0].isdigit()]
    cur_run_id = max(prev_run_ids, default=-1) + 1
    run_dir = os.path.join(outdir, f"{cur_run_id:05d}-{desc}")
    assert not os.path.exists(run_dir)
    if not dry_run:
        os.makedirs(run_dir)
    return run_dir
