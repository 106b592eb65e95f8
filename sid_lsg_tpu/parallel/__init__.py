from .mesh import (
    MeshConfig,
    batch_sharding,
    make_hybrid_mesh,
    make_mesh,
    param_shardings,
    replicated_sharding,
    shard_batch,
    shard_params,
)
from .runtime import (
    get_process_index,
    get_process_count,
    init_distributed,
    print0,
    should_stop,
    sync_hosts,
    update_progress,
)

__all__ = [
    "MeshConfig",
    "batch_sharding",
    "make_hybrid_mesh",
    "make_mesh",
    "param_shardings",
    "replicated_sharding",
    "shard_batch",
    "shard_params",
    "get_process_index",
    "get_process_count",
    "init_distributed",
    "print0",
    "should_stop",
    "sync_hosts",
    "update_progress",
]
