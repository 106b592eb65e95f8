"""CLIP text encoder in Flax — prompt conditioning for SD.

Replaces the transformers ``CLIPTextModel`` loaded at reference
``training/sid_sd_util.py:70`` and evaluated (frozen, no-grad) inside every
sampler/denoiser call (sid_sd_util.py:171-172,229-240).  Covers both towers:
SD1.5's CLIP ViT-L/14 text model (quick_gelu, 12 layers, 768 wide) and
SD2.x's OpenCLIP ViT-H tower (gelu, 23-of-24 layers, 1024 wide) via
``CLIPTextConfig``.

Parity is testable directly against the baked-in torch ``transformers``
implementation (tests/test_clip_text.py) — the strongest numerical gate in
the repo, since the text embedding feeds every UNet call.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .configs import CLIPTextConfig
from .layers import Attention, LayerNorm32


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(name)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_attention_heads
        h = LayerNorm32(cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm1")(x)
        x = x + Attention(
            cfg.num_attention_heads, head_dim, use_bias=True, dtype=self.dtype, name="self_attn"
        )(h, causal=True)
        h = LayerNorm32(cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(cfg.hidden_act)(h.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """(B, L) token ids -> (B, L, hidden) last hidden state (post final LN)."""
        cfg = self.config
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding")(
            input_ids
        )
        pos_ids = jnp.arange(input_ids.shape[1])[None, :]
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype,
            name="position_embedding",
        )(pos_ids)
        x = tok + pos
        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
        return LayerNorm32(cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(x)
