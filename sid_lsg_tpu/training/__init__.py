from .state import SiDState, make_optimizer, nan_to_num_grads, init_state
from .distill import DistillConfig, jit_train_step, make_train_step, ema_beta
from . import adversarial

__all__ = [
    "adversarial",
    "SiDState",
    "make_optimizer",
    "nan_to_num_grads",
    "init_state",
    "DistillConfig",
    "jit_train_step",
    "make_train_step",
    "ema_beta",
]
