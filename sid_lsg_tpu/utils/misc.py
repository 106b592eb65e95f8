"""Runtime misc: shape asserts, profiling annotations, module summaries,
device memory stats.

Counterpart of reference ``torch_utils/misc.py``: ``assert_shape:81``,
``profiled_function:99`` (torch profiler record_function ->
``jax.profiler.TraceAnnotation``), ``print_module_summary:196`` (Flax
tabulate), plus the CPU/TPU memory numbers the tick line prints
(``sid_training_loop.py:574-588``).  ``InfiniteSampler`` lives in
``data.prompts``; ``ddp_sync``/``copy_params_and_buffers``/
``check_ddp_consistency`` have no JAX counterpart by construction (no
replicated module objects to keep in sync — XLA owns replication).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np


def assert_shape(tensor: Any, ref_shape: Sequence[Optional[int]]) -> None:
    """Shape check with None wildcards (reference misc.assert_shape:81)."""
    shape = tuple(np.shape(tensor))
    if len(shape) != len(ref_shape):
        raise AssertionError(
            f"wrong number of dimensions: got {len(shape)}, expected {len(ref_shape)}"
        )
    for i, (got, ref) in enumerate(zip(shape, ref_shape)):
        if ref is not None and got != ref:
            raise AssertionError(f"wrong size for dimension {i}: got {got}, expected {ref}")


def profiled_function(fn):
    """Annotate a function in the jax profiler trace (reference :99)."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.profiler.TraceAnnotation(fn.__name__):
            return fn(*args, **kwargs)

    return wrapper


def start_profiler_trace(logdir: str) -> None:
    jax.profiler.start_trace(logdir)


def stop_profiler_trace() -> None:
    jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Per-device {bytes_in_use, peak_bytes_in_use} when the backend reports it
    (TPU does; CPU returns {}).  Replaces torch.cuda.max_memory_allocated."""
    stats = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use", 0),
                "peak_bytes_in_use": s.get("peak_bytes_in_use", 0),
            }
    return stats


def peak_device_memory_gb() -> float:
    stats = device_memory_stats()
    if not stats:
        return 0.0
    return max(s["peak_bytes_in_use"] for s in stats.values()) / 2**30


def cpu_memory_gb() -> float:
    try:
        import resource

        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
    except Exception:
        return 0.0


def print_module_summary(module, *init_args, depth: int = 2, **init_kwargs) -> str:
    """Parameter-count table for a Flax module (reference :196 role)."""
    table = module.tabulate(
        jax.random.PRNGKey(0), *init_args, depth=depth,
        console_kwargs={"width": 120}, **init_kwargs,
    )
    print(table)
    return table


def count_params(tree: Any) -> int:
    return sum(int(np.prod(np.shape(p))) for p in jax.tree_util.tree_leaves(tree))
