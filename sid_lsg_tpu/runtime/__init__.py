from .checkpoint import (
    CheckpointManager,
    export_generator,
    load_generator_params,
    torch_pickle_state_dict,
)

__all__ = [
    "CheckpointManager",
    "export_generator",
    "load_generator_params",
    "torch_pickle_state_dict",
]
