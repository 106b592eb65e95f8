"""Shared Flax building blocks for the SD model zoo (NHWC, TPU layout).

Functional re-design of the diffusers blocks the reference relies on
(UNet2DConditionModel / AutoencoderKL internals, loaded at
``training/sid_sd_util.py:70-79``).  Everything is channels-last; convs are
``flax.linen.Conv`` (HWIO kernels, XLA's native TPU conv layout); attention
routes through the ops registry (Pallas flash or XLA einsum); GroupNorm+SiLU
uses the fused kernel.  Parameters are stored float32 (master weights), and
``dtype`` selects the activation/compute precision (bf16 on TPU replaces the
reference's fp16 + NaN-hygiene machinery, SURVEY.md §5).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .. import ops


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding parity)."""
    half_dim = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class GroupNorm(nn.Module):
    """GroupNorm with optional fused SiLU, f32 statistics, NHWC."""

    num_groups: int = 32
    eps: float = 1e-5
    silu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if x.ndim == 4:
            y = ops.group_norm(x, scale, bias, self.num_groups, self.eps, silu=self.silu)
        else:  # (B, L, C) -> treat L as a 1-wide spatial dim
            y = ops.group_norm(
                x[:, :, None, :], scale, bias, self.num_groups, self.eps, silu=self.silu
            )[:, :, 0, :]
        return y.astype(self.dtype)


class TimestepEmbedding(nn.Module):
    """Two-layer MLP over the sinusoidal embedding (time_embedding in SD)."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_1")(t_emb.astype(self.dtype))
        x = nn.silu(x)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_2")(x)


class Attention(nn.Module):
    """Multi-head attention: self (context=None) or cross.

    q/k/v have no bias, output projection has bias (diffusers Attention
    parity).  Head split/merge via reshape; the inner product runs through
    ``ops.attention`` so Pallas flash kicks in on TPU inference paths.
    """

    num_heads: int
    head_dim: int
    out_dim: Optional[int] = None
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None, causal: bool = False
    ) -> jnp.ndarray:
        ctx = x if context is None else context
        inner = self.num_heads * self.head_dim
        out_dim = self.out_dim or x.shape[-1]
        dense = lambda d, name, bias: nn.Dense(d, use_bias=bias, dtype=self.dtype, name=name)
        q = dense(inner, "to_q", self.use_bias)(x)
        k = dense(inner, "to_k", self.use_bias)(ctx)
        v = dense(inner, "to_v", self.use_bias)(ctx)

        b, sq, _ = q.shape
        sk = k.shape[1]
        split = lambda t, s: t.reshape(b, s, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        out = ops.attention(split(q, sq), split(k, sk), split(v, sk), causal=causal)
        out = out.transpose(0, 2, 1, 3).reshape(b, sq, inner)
        # Named for selective rematerialisation: UNet2DCondition's
        # remat_policy='attn' saves exactly these activations (the most
        # expensive recompute in a transformer block) and recomputes the rest.
        out = checkpoint_name(out, "attn_out")
        return nn.Dense(out_dim, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate.astype(jnp.float32), approximate=False).astype(self.dtype)


class FeedForward(nn.Module):
    """GEGLU feed-forward, mult=4 (diffusers FeedForward parity)."""

    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        h = GEGLU(dim * self.mult, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(dim, dtype=self.dtype, name="net_2")(h)


class LayerNorm32(nn.Module):
    """LayerNorm computed in f32, output cast to dtype."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32, name="ln")(x.astype(jnp.float32))
        return y.astype(self.dtype)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> GEGLU FF, each pre-LN residual."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        h = LayerNorm32(dtype=self.dtype, name="norm1")(x)
        x = x + Attention(self.num_heads, self.head_dim, dtype=self.dtype, name="attn1")(h)
        h = LayerNorm32(dtype=self.dtype, name="norm2")(x)
        x = x + Attention(self.num_heads, self.head_dim, dtype=self.dtype, name="attn2")(h, context)
        h = LayerNorm32(dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(dtype=self.dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> proj_in -> blocks -> proj_out -> residual.

    ``use_linear_projection`` selects Dense (SD2.x) vs 1x1 conv (SD1.5) for the
    in/out projections; both act on the flattened (B, H*W, C) sequence.
    """

    num_heads: int
    head_dim: int
    depth: int = 1
    use_linear_projection: bool = False
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm(self.norm_num_groups, eps=1e-6, dtype=self.dtype, name="norm")(x)
        inner = self.num_heads * self.head_dim
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        else:
            x = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, inner)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.num_heads, self.head_dim, dtype=self.dtype, name=f"blocks_{i}"
            )(x, context)
        if self.use_linear_projection:
            x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, inner)
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual


class ResnetBlock2D(nn.Module):
    """GN+SiLU -> conv -> (+temb) -> GN+SiLU -> conv, with 1x1 shortcut."""

    out_channels: int
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        residual = x
        h = GroupNorm(self.norm_num_groups, self.norm_eps, silu=True, dtype=self.dtype, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = GroupNorm(self.norm_num_groups, self.norm_eps, silu=True, dtype=self.dtype, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(residual)
        return h + residual


class Downsample2D(nn.Module):
    """Stride-2 3x3 conv.

    UNet blocks use symmetric padding 1; the VAE encoder pads asymmetrically
    (0,1)x(0,1) (diffusers Encoder.Downsample2D with padding=0 + manual pad).
    """

    channels: int
    asymmetric_pad: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = ((0, 1), (0, 1)) if self.asymmetric_pad else ((1, 1), (1, 1))
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=pad, dtype=self.dtype, name="conv"
        )(x)


class Upsample2D(nn.Module):
    """Nearest-neighbor 2x then 3x3 conv."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class VAEAttention(nn.Module):
    """Single-head spatial self-attention used in the VAE mid block."""

    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        y = GroupNorm(self.norm_num_groups, eps=1e-6, dtype=self.dtype, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        y = Attention(1, c, use_bias=True, dtype=self.dtype, name="attn")(y)
        return y.reshape(b, h, w, c) + residual
