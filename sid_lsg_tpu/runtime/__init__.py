from .compile_cache import enable as enable_compile_cache
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
    "enable_compile_cache",
]
