"""UNet2DCondition in Flax (NHWC) — the SD denoiser backbone.

Replaces the diffusers ``UNet2DConditionModel`` the reference loads at
``training/sid_sd_util.py:77`` and calls from sampler/denoiser
(sid_sd_util.py:184,245,263).  Same topology (conv_in, 4 down levels with
cross-attention on the first three, mid resnet/transformer/resnet, mirrored up
path with skip concatenation, GN+SiLU head), parameterised by
``UNetConfig`` so SD1.5, SD2.1-base and tiny test models share one class.

TPU-first choices: channels-last activations, fused GroupNorm+SiLU, attention
through the ops registry (Pallas flash eligible), and an optional
``remat`` flag that wraps each down/up level in ``jax.checkpoint`` — the
counterpart of the reference's ``gradient_checkpointing`` knob
(sid_sd_util.py:115-116) for fitting backprop-through-sampler graphs in HBM.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .configs import UNetConfig
from .layers import (
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    Upsample2D,
    timestep_embedding,
)


class UNet2DCondition(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    # Rematerialisation policy when remat=True: 'full' recomputes everything
    # (minimum memory), 'dots' saves matmul/conv outputs and recomputes only
    # the cheap pointwise chains (less recompute FLOP where HBM headroom
    # exists), 'attn' saves only the attention outputs (tagged 'attn_out' in
    # layers.Attention) — the single most expensive recompute in a
    # transformer block, at a fraction of 'dots' memory — and 'attn_offload'
    # parks those same activations in pinned host RAM instead of HBM.
    # See BENCH_NOTES.md for the measured trades.
    remat_policy: str = "full"

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, H, W, C_in) latents, NHWC
        timesteps: jnp.ndarray,  # (B,) int
        encoder_hidden_states: jnp.ndarray,  # (B, L, cross_dim)
        encoder_only: bool = False,
    ) -> jnp.ndarray:
        """With ``encoder_only=True`` (static), stop after the mid block and
        return the bottleneck feature map (B, H/8, W/8, C_max) instead of the
        prediction — the SiDA discriminator tower (``training/adversarial.py``)
        reads the fake-score net this way, reusing conv_in + down path + mid
        parameters with no up path compute and zero extra parameters."""
        cfg = self.config
        n_levels = len(cfg.block_out_channels)
        if self.remat:
            policy = {
                "full": None,
                "dots": jax.checkpoint_policies.checkpoint_dots,
                "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                "attn": jax.checkpoint_policies.save_only_these_names("attn_out"),
                # Save the flash kernel's own outputs (out + row logsumexp):
                # the custom-VJP's residual rebuild then stops at the kernel
                # boundary — projections recompute, the O(S) kernel does NOT
                # re-run (it is ~12% of the full-width step under 'full').
                # Memory cost ~= 'attn' (same element count + a (B,H,S) lse).
                "flash": jax.checkpoint_policies.save_only_these_names(
                    "flash_out", "flash_lse"),
                "attn_offload": jax.checkpoint_policies.save_and_offload_only_these_names(
                    names_which_can_be_saved=[],
                    names_which_can_be_offloaded=["attn_out"],
                    offload_src="device",
                    offload_dst="pinned_host",
                ),
            }[self.remat_policy]
            resnet = nn.remat(ResnetBlock2D, policy=policy)
            transformer = nn.remat(Transformer2D, policy=policy)
        else:
            resnet, transformer = ResnetBlock2D, Transformer2D

        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        )
        temb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype, name="time_embedding")(t_emb)
        context = encoder_hidden_states.astype(self.dtype)

        h = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in"
        )(sample.astype(self.dtype))
        skips = [h]

        # Down path.
        for i, ch in enumerate(cfg.block_out_channels):
            heads = cfg.num_attention_heads[i]
            for j in range(cfg.layers_per_block):
                h = resnet(
                    ch, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype,
                    name=f"down_{i}_resnet_{j}",
                )(h, temb)
                if cfg.cross_attention_levels[i]:
                    h = transformer(
                        heads, ch // heads, cfg.transformer_layers_per_block,
                        cfg.use_linear_projection, cfg.norm_num_groups, dtype=self.dtype,
                        name=f"down_{i}_attn_{j}",
                    )(h, context)
                skips.append(h)
            if i < n_levels - 1:
                h = Downsample2D(ch, dtype=self.dtype, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # Mid.
        mid_ch = cfg.block_out_channels[-1]
        mid_heads = cfg.num_attention_heads[-1]
        h = resnet(
            mid_ch, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype, name="mid_resnet_0"
        )(h, temb)
        h = transformer(
            mid_heads, mid_ch // mid_heads, cfg.transformer_layers_per_block,
            cfg.use_linear_projection, cfg.norm_num_groups, dtype=self.dtype, name="mid_attn",
        )(h, context)
        h = resnet(
            mid_ch, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype, name="mid_resnet_1"
        )(h, temb)
        if encoder_only:
            return h

        # Up path (deepest level first), popping skips.
        for i in reversed(range(n_levels)):
            ch = cfg.block_out_channels[i]
            heads = cfg.num_attention_heads[i]
            for j in range(cfg.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = resnet(
                    ch, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype,
                    name=f"up_{i}_resnet_{j}",
                )(h, temb)
                if cfg.cross_attention_levels[i]:
                    h = transformer(
                        heads, ch // heads, cfg.transformer_layers_per_block,
                        cfg.use_linear_projection, cfg.norm_num_groups, dtype=self.dtype,
                        name=f"up_{i}_attn_{j}",
                    )(h, context)
            if i > 0:
                h = Upsample2D(ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)

        assert not skips
        h = GroupNorm(
            cfg.norm_num_groups, cfg.norm_eps, silu=True, dtype=self.dtype, name="conv_norm_out"
        )(h)
        out = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
        return out
