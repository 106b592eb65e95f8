"""Multi-host runtime init + host-level sync.

Replaces the reference's rank/rendezvous layer (``torch_utils/distributed.py``:
``init:14`` spawning env-var NCCL process groups, ``get_rank:35``,
``print0:58``, stubs ``should_stop:48`` / ``update_progress:53``).  Under
single-controller JAX there is one process per *host*; chips never appear as
ranks.  Collectives live inside jitted programs (psum/all_gather emitted by
XLA), so the only runtime duties left are:

- ``init_distributed``: ``jax.distributed.initialize`` for multi-host pods
  (no-op for single-process runs — the common local/test case),
- ``print0`` / process-index helpers,
- ``sync_hosts``: the "rank0 downloads first" barrier pattern
  (``sid_training_loop.py:220-231``) via ``multihost_utils``.

``should_stop`` / ``update_progress`` keep the reference's extension-point
shape (cluster preemption hooks); wire them to your scheduler as needed.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise the multi-host JAX runtime when running on >1 host.

    Arguments default from env: ``COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID`` — the launch-env contract replacing the reference's
    torchrun ``RANK``/``WORLD_SIZE`` vars (``torch_utils/distributed.py:14-31``;
    on cloud TPU pods JAX auto-detects all three and none are needed).  Safe to
    call unconditionally: single-process runs return immediately.  Must run
    before the first JAX backend query (CLIs call it at entry).
    """
    global _initialized
    if _initialized:
        return
    explicit = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    multi_env = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    if explicit or (multi_env and int(multi_env) > 1):
        if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
            num_processes = int(os.environ["JAX_NUM_PROCESSES"])
        if process_id is None and os.environ.get("JAX_PROCESS_ID"):
            process_id = int(os.environ["JAX_PROCESS_ID"])
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes,
            process_id=process_id,
        )
    # AFTER distributed init: enable() resolves jax.default_backend() to pick
    # the backend-partitioned cache subdir, and backend queries are only safe
    # once the multi-host runtime exists.
    from ..runtime.compile_cache import enable as _enable_cache

    _enable_cache()
    _initialized = True


def get_process_index() -> int:
    return jax.process_index()


def get_process_count() -> int:
    return jax.process_count()


def print0(*args, **kwargs) -> None:
    """Print only on process 0 (reference distributed.py:58)."""
    if jax.process_index() == 0:
        print(*args, **kwargs)


def sync_hosts(name: str = "sync") -> None:
    """Barrier across hosts (reference's torch.distributed.barrier sites)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def should_stop() -> bool:
    """Cluster-requested graceful stop; polled once per tick
    (reference sid_training_loop.py:591-594).  Hook for preemption signals.

    Multi-process: the training loop is COLLECTIVE (train step, grids,
    snapshot gathers), so the flag must be AGREED — a preemption signal
    delivered to one host only would make it break out while the others
    block forever in the next collective.  Any-host-set => every host stops,
    decided by one scalar allgather per tick."""
    local = os.path.exists(
        os.environ.get("SIDLSG_STOP_FILE", "/nonexistent-stop-file")
    )
    if get_process_count() == 1:
        return local
    import numpy as np
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.asarray([local]))
    return bool(np.any(flags))


def update_progress(cur: int, total: int) -> None:
    """Progress beacon for external schedulers (reference stub at
    distributed.py:52-54)."""
    del cur, total
