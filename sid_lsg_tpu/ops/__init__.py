from .registry import impl_for, set_default_impl, get_default_impl, register_op, list_ops
from .bias_act import bias_act, activation_funcs
from .upfirdn2d import upfirdn2d, setup_filter, filter2d, upsample2d, downsample2d
from .groupnorm import group_norm_silu, group_norm
from .attention import attention, flash_attention

__all__ = [
    "impl_for",
    "set_default_impl",
    "get_default_impl",
    "register_op",
    "list_ops",
    "bias_act",
    "activation_funcs",
    "upfirdn2d",
    "setup_filter",
    "filter2d",
    "upsample2d",
    "downsample2d",
    "group_norm_silu",
    "group_norm",
    "attention",
    "flash_attention",
]
from .resample_conv import conv2d_resample, fma, grid_sample

__all__ += ["conv2d_resample", "fma", "grid_sample"]
