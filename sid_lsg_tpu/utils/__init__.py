from .util import (
    EasyDict,
    Logger,
    format_time,
    construct_class_by_name,
    get_obj_by_name,
    call_func_by_name,
)
from . import training_stats

__all__ = [
    "EasyDict",
    "Logger",
    "format_time",
    "construct_class_by_name",
    "get_obj_by_name",
    "call_func_by_name",
    "training_stats",
]
