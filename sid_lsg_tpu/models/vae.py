"""AutoencoderKL in Flax (NHWC) — SD latent codec.

Replaces the diffusers ``AutoencoderKL`` loaded at reference
``training/sid_sd_util.py:73`` and used for decode in the sampler
(sid_sd_util.py:198-209).  The decoder is the production path (one-step
generation decodes latents to pixels); the encoder exists for capability
parity (image-conditioned workflows / dataset prep).

The fp16-overflow upcast dance of the reference (``upcast_vae``,
sid_sd_util.py:30-48) is replaced by design: decoder mid-block attention and
group-norm statistics always run in float32, while convs follow ``dtype``
(bf16 on TPU has fp32-range exponents, so no overflow hygiene is needed).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .configs import VAEConfig
from .layers import Downsample2D, GroupNorm, ResnetBlock2D, Upsample2D, VAEAttention


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        boc = list(reversed(cfg.block_out_channels))  # e.g. [512, 512, 256, 128]
        h = nn.Conv(boc[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            z.astype(self.dtype)
        )
        h = ResnetBlock2D(boc[0], cfg.norm_num_groups, 1e-6, dtype=self.dtype, name="mid_resnet_0")(h)
        h = VAEAttention(cfg.norm_num_groups, dtype=jnp.float32, name="mid_attn")(
            h.astype(jnp.float32)
        ).astype(self.dtype)
        h = ResnetBlock2D(boc[0], cfg.norm_num_groups, 1e-6, dtype=self.dtype, name="mid_resnet_1")(h)
        for i, ch in enumerate(boc):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock2D(
                    ch, cfg.norm_num_groups, 1e-6, dtype=self.dtype, name=f"up_{i}_resnet_{j}"
                )(h)
            if i < len(boc) - 1:
                h = Upsample2D(ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = GroupNorm(cfg.norm_num_groups, 1e-6, silu=True, dtype=self.dtype, name="conv_norm_out")(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        boc = cfg.block_out_channels
        h = nn.Conv(boc[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            x.astype(self.dtype)
        )
        for i, ch in enumerate(boc):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(
                    ch, cfg.norm_num_groups, 1e-6, dtype=self.dtype, name=f"down_{i}_resnet_{j}"
                )(h)
            if i < len(boc) - 1:
                h = Downsample2D(
                    ch, asymmetric_pad=True, dtype=self.dtype, name=f"down_{i}_downsample"
                )(h)
        h = ResnetBlock2D(boc[-1], cfg.norm_num_groups, 1e-6, dtype=self.dtype, name="mid_resnet_0")(h)
        h = VAEAttention(cfg.norm_num_groups, dtype=jnp.float32, name="mid_attn")(
            h.astype(jnp.float32)
        ).astype(self.dtype)
        h = ResnetBlock2D(boc[-1], cfg.norm_num_groups, 1e-6, dtype=self.dtype, name="mid_resnet_1")(h)
        h = GroupNorm(cfg.norm_num_groups, 1e-6, silu=True, dtype=self.dtype, name="conv_norm_out")(h)
        return nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)


class AutoencoderKL(nn.Module):
    """Full VAE.  ``decode`` / ``encode`` are exposed via ``method=``."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        conv = lambda c, name: nn.Conv(c, (1, 1), dtype=self.dtype, name=name)
        self.quant_conv = conv(2 * self.config.latent_channels, "quant_conv")
        self.post_quant_conv = conv(self.config.latent_channels, "post_quant_conv")

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """Latents (already divided by scaling_factor by the caller) -> pixels [-1,1]."""
        z = self.post_quant_conv(latents.astype(self.dtype))
        return self.decoder(z)

    def encode_moments(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Images [-1,1] -> posterior (mean, logvar)."""
        moments = self.quant_conv(self.encoder(images))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, images: jnp.ndarray, rng: jax.Array | None = None) -> jnp.ndarray:
        mean, logvar = self.encode_moments(images)
        if rng is None:
            return mean
        return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """Autoencode (used only for init/shape-checking)."""
        return self.decode(self.encode(images))
