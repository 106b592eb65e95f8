from .state import SiDState, make_optimizer, nan_to_num_grads, init_state
from .distill import DistillConfig, make_train_step, ema_beta

__all__ = [
    "SiDState",
    "make_optimizer",
    "nan_to_num_grads",
    "init_state",
    "DistillConfig",
    "make_train_step",
    "ema_beta",
]
