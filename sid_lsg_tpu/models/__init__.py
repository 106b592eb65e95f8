from .configs import (
    PRESETS,
    SD15,
    SD21_BASE,
    TINY,
    CLIPTextConfig,
    SDConfig,
    UNetConfig,
    VAEConfig,
    resolve,
    scaled_unet_config,
)
from .unet import UNet2DCondition
from .vae import AutoencoderKL, Decoder, Encoder
from .clip_text import CLIPTextModel
from .tokenizer import CLIPTokenizer, HashTokenizer, load_tokenizer

__all__ = [
    "PRESETS",
    "SD15",
    "SD21_BASE",
    "TINY",
    "CLIPTextConfig",
    "SDConfig",
    "UNetConfig",
    "VAEConfig",
    "resolve",
    "UNet2DCondition",
    "AutoencoderKL",
    "Decoder",
    "Encoder",
    "CLIPTextModel",
    "CLIPTokenizer",
    "HashTokenizer",
    "load_tokenizer",
]
