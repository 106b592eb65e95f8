"""EDM model zoo: SongUNet / DhariwalUNet + sigma-preconditioners.

Capability parity with reference ``training/networks.py`` (SongUNet:229,
DhariwalUNet:372, VPPrecond:469, VEPrecond:528, iDDPMPrecond:572,
EDMPrecond:632 — the SiD/EDM lineage nets listed in SURVEY.md §2.4).
Re-derived from the EDM formulation ("Elucidating the Design Space of
Diffusion-Based Generative Models", Karras et al. 2022), not translated:
NHWC layout, FIR resampling through the TPU ``ops.upfirdn2d`` conv
formulation (N2), fused bias+activation through ``ops.bias_act`` (N1), f32
group-norm statistics.

Covers both embedding types (positional / fourier), the skip / residual
encoder and skip decoder variants (DDPM++ vs NCSN++ configs), adaptive-scale
conditioning (ADM), and the four preconditioner wrappers with their exact
c_skip / c_out / c_in / c_noise schedules.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import ops


# ---------------------------------------------------------------------------
# Small pieces


class PositionalEmbedding(nn.Module):
    num_channels: int
    max_positions: int = 10000
    endpoint: bool = False

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        half = self.num_channels // 2
        freqs = jnp.arange(half, dtype=jnp.float32)
        freqs = freqs / (half - (1 if self.endpoint else 0))
        freqs = (1.0 / self.max_positions) ** freqs
        angles = x[:, None].astype(jnp.float32) * freqs[None]
        return jnp.concatenate([jnp.cos(angles), jnp.sin(angles)], axis=1)


class FourierEmbedding(nn.Module):
    num_channels: int
    scale: float = 16.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        freqs = self.param(
            "freqs",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.num_channels // 2,),
        )
        angles = 2.0 * jnp.pi * x[:, None].astype(jnp.float32) * freqs[None]
        return jnp.concatenate([jnp.cos(angles), jnp.sin(angles)], axis=1)


def _he_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        fan_in = int(np.prod(shape[:-1]))
        std = scale / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -np.sqrt(3) * std, np.sqrt(3) * std)

    return init


class EDMLinear(nn.Module):
    features: int
    init_scale: float = 1.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", _he_init(self.init_scale), (x.shape[-1], self.features))
        y = x @ k
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y


class EDMConv(nn.Module):
    features: int
    kernel: int = 3
    init_scale: float = 1.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):  # NHWC
        k = self.param(
            "kernel", _he_init(self.init_scale),
            (self.kernel, self.kernel, x.shape[-1], self.features),
        )
        pad = self.kernel // 2
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = ops.bias_act(y, b.astype(y.dtype), dim=3, act="linear")
        return y


def edm_group_norm(x: jnp.ndarray, scale, bias, eps: float, silu: bool) -> jnp.ndarray:
    num_groups = min(32, x.shape[-1] // 4) or 1
    return ops.group_norm(x, scale, bias, num_groups=num_groups, eps=eps, silu=silu)


class EDMGroupNorm(nn.Module):
    eps: float = 1e-5
    silu: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return edm_group_norm(x, scale, bias, self.eps, self.silu)


def _resample(x: jnp.ndarray, f: jnp.ndarray, mode: str) -> jnp.ndarray:
    """FIR up/down (NHWC wrapper over the NCHW upfirdn2d op)."""
    if mode == "keep":
        return x
    xc = jnp.transpose(x, (0, 3, 1, 2))
    if mode == "up":
        xc = ops.upsample2d(xc, f)
    else:
        xc = ops.downsample2d(xc, f)
    return jnp.transpose(xc, (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# The shared EDM UNet block


class EDMUNetBlock(nn.Module):
    out_channels: int
    emb_channels: int
    up: bool = False
    down: bool = False
    attention: bool = False
    num_heads: Optional[int] = None
    channels_per_head: int = 64
    dropout: float = 0.0
    skip_scale: float = 1.0
    eps: float = 1e-5
    resample_filter: Tuple[int, ...] = (1, 1)
    resample_proj: bool = False
    adaptive_scale: bool = True
    init_zero_scale: float = 0.0  # last-layer init (0 => exact zero)
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        c_out = self.out_channels
        # No max(...,1): the reference disables attention when out_channels <
        # channels_per_head (networks.py:150 num_heads computation).
        heads = (
            self.num_heads
            if self.num_heads is not None
            else c_out // self.channels_per_head
        )
        f = ops.setup_filter(list(self.resample_filter))
        mode = "up" if self.up else ("down" if self.down else "keep")

        orig = x
        h = EDMGroupNorm(self.eps, silu=True, name="norm0")(x)
        h = _resample(h, f, mode)
        orig = _resample(orig, f, mode)
        h = EDMConv(c_out, 3, name="conv0")(h)

        params = EDMLinear(
            c_out * (2 if self.adaptive_scale else 1), name="affine"
        )(emb.astype(jnp.float32))
        if self.adaptive_scale:
            scale, shift = jnp.split(params[:, None, None, :], 2, axis=-1)
            h = EDMGroupNorm(self.eps, name="norm1")(h)
            h = nn.silu(h * (scale + 1.0) + shift)
        else:
            h = h + params[:, None, None, :]
            h = EDMGroupNorm(self.eps, silu=True, name="norm1")(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=self.deterministic)(h)
        h = EDMConv(c_out, 3, init_scale=self.init_zero_scale, name="conv1")(h)

        if c_out != c_in or self.up or self.down:
            kernel = 1 if self.resample_proj or c_out != c_in else 0
            if kernel:
                orig = EDMConv(c_out, 1, name="skip")(orig)
        x = (h + orig) * self.skip_scale

        if self.attention and heads > 0:
            a = EDMGroupNorm(self.eps, name="norm2")(x)
            b, hh, ww, _ = a.shape
            qkv = EDMConv(c_out * 3, 1, name="qkv")(a)
            # Channel layout (heads, head_dim, 3): matches the reference's
            # reshape(B*heads, C//heads, 3, -1) (networks.py:186) so converted
            # qkv conv weights drop in without permutation.
            qkv = qkv.reshape(b, hh * ww, heads, c_out // heads, 3)
            q, k, v = (qkv[..., i].transpose(0, 2, 1, 3) for i in range(3))
            out = ops.attention(q, k, v)
            out = out.transpose(0, 2, 1, 3).reshape(b, hh, ww, c_out)
            out = EDMConv(c_out, 1, init_scale=self.init_zero_scale, name="proj")(out)
            x = (x + out) * self.skip_scale
        return x


# ---------------------------------------------------------------------------
# SongUNet (DDPM++ / NCSN++)


class SongUNet(nn.Module):
    img_resolution: int
    in_channels: int
    out_channels: int
    label_dim: int = 0
    augment_dim: int = 0
    model_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 2, 2, 2)
    channel_mult_emb: int = 4
    num_blocks: int = 4
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.10
    label_dropout: float = 0.0
    embedding_type: str = "positional"  # 'positional' (DDPM++) | 'fourier' (NCSN++)
    channel_mult_noise: int = 1
    encoder_type: str = "standard"  # 'standard' | 'skip' | 'residual'
    decoder_type: str = "standard"  # 'standard' | 'skip'
    resample_filter: Tuple[int, ...] = (1, 1)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, H, W, C) NHWC
        noise_labels: jnp.ndarray,  # (B,)
        class_labels: Optional[jnp.ndarray] = None,
        augment_labels: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        emb_channels = self.model_channels * self.channel_mult_emb
        noise_channels = self.model_channels * self.channel_mult_noise
        block = dict(
            emb_channels=emb_channels, num_heads=1, dropout=self.dropout,
            skip_scale=float(np.sqrt(0.5)), eps=1e-6,
            resample_filter=self.resample_filter, resample_proj=True,
            adaptive_scale=False,
        )
        f = ops.setup_filter(list(self.resample_filter))

        # Embedding pipeline.
        if self.embedding_type == "fourier":
            emb = FourierEmbedding(noise_channels, name="map_noise")(noise_labels)
        else:
            emb = PositionalEmbedding(noise_channels, endpoint=True, name="map_noise")(
                noise_labels
            )
        # [cos,sin] -> [sin,cos] swap (reference networks.py:330).
        cos_half, sin_half = jnp.split(emb, 2, axis=1)
        emb = jnp.concatenate([sin_half, cos_half], axis=1)
        if self.label_dim:
            assert class_labels is not None
            emb = emb + EDMLinear(noise_channels, name="map_label")(
                class_labels.astype(jnp.float32) * float(np.sqrt(self.label_dim))
            )
        if self.augment_dim and augment_labels is not None:
            emb = emb + EDMLinear(noise_channels, use_bias=False, name="map_augment")(
                augment_labels.astype(jnp.float32)
            )
        emb = nn.silu(EDMLinear(emb_channels, name="map_layer0")(emb))
        emb = nn.silu(EDMLinear(emb_channels, name="map_layer1")(emb))

        # Encoder.
        skips = []
        aux = x
        h = x
        c_out = self.model_channels
        for level, mult in enumerate(self.channel_mult):
            res = self.img_resolution >> level
            if level == 0:
                h = EDMConv(c_out, 3, name=f"enc_{res}_conv")(h)
                skips.append(h)
            else:
                h = EDMUNetBlock(c_out, down=True, name=f"enc_{res}_down", **block)(h, emb)
                if self.encoder_type == "skip":
                    aux = _resample(aux, f, "down")
                    h = h + EDMConv(c_out, 1, name=f"enc_{res}_aux_skip")(aux)
                elif self.encoder_type == "residual":
                    # Fused conv-then-FIR-downsample order (reference Conv2d
                    # fused_resample=True branch, networks.py:80-82): 3x3 conv
                    # at full res with w_pad+f_pad padding, then stride-2 FIR
                    # with no padding.
                    fp = (len(self.resample_filter) - 1) // 2
                    a = jnp.pad(aux, ((0, 0), (fp, fp), (fp, fp), (0, 0)))
                    a = EDMConv(c_out, 3, name=f"enc_{res}_aux_residual")(a)
                    a = jnp.transpose(a, (0, 3, 1, 2))
                    a = ops.upfirdn2d(a, f, down=2, padding=0)
                    aux = jnp.transpose(a, (0, 2, 3, 1))
                    h = (h + aux) * float(np.sqrt(0.5))
                    aux = h
                skips.append(h)
            c_out = self.model_channels * mult
            for idx in range(self.num_blocks):
                h = EDMUNetBlock(
                    c_out, attention=(res in self.attn_resolutions),
                    name=f"enc_{res}_block{idx}", **block,
                )(h, emb)
                skips.append(h)

        # Decoder.
        aux_out = None
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            res = self.img_resolution >> level
            c_out = self.model_channels * mult
            if level == len(self.channel_mult) - 1:
                h = EDMUNetBlock(h.shape[-1], attention=True, name=f"dec_{res}_in0", **block)(h, emb)
                h = EDMUNetBlock(h.shape[-1], name=f"dec_{res}_in1", **block)(h, emb)
            else:
                # Up block keeps the deeper level's width (in == out, ref :310).
                h = EDMUNetBlock(h.shape[-1], up=True, name=f"dec_{res}_up", **block)(h, emb)
            for idx in range(self.num_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                # Only the last decoder block per level attends (networks.py:316).
                h = EDMUNetBlock(
                    c_out,
                    attention=(idx == self.num_blocks and res in self.attn_resolutions),
                    name=f"dec_{res}_block{idx}", **block,
                )(h, emb)
            if self.decoder_type == "skip" or level == 0:
                if self.decoder_type == "skip" and level < len(self.channel_mult) - 1:
                    aux_out = _resample(aux_out, f, "up")
                tmp = EDMGroupNorm(1e-6, silu=True, name=f"dec_{res}_aux_norm")(h)
                tmp = EDMConv(
                    self.out_channels, 3,
                    init_scale=0.0 if level == 0 and self.decoder_type != "skip" else 1.0,
                    name=f"dec_{res}_aux_conv",
                )(tmp)
                aux_out = tmp if aux_out is None else aux_out + tmp
        assert not skips
        return aux_out


# ---------------------------------------------------------------------------
# DhariwalUNet (ADM)


class DhariwalUNet(nn.Module):
    img_resolution: int
    in_channels: int
    out_channels: int
    label_dim: int = 0
    augment_dim: int = 0
    model_channels: int = 192
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    channel_mult_emb: int = 4
    num_blocks: int = 3
    attn_resolutions: Tuple[int, ...] = (32, 16, 8)
    dropout: float = 0.10
    label_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, noise_labels, class_labels=None, augment_labels=None):
        emb_channels = self.model_channels * self.channel_mult_emb
        block = dict(
            emb_channels=emb_channels, channels_per_head=64,
            dropout=self.dropout, adaptive_scale=True,
        )
        emb = PositionalEmbedding(self.model_channels, name="map_noise")(noise_labels)
        if self.augment_dim and augment_labels is not None:
            emb = emb + EDMLinear(
                self.model_channels, use_bias=False, name="map_augment"
            )(augment_labels.astype(jnp.float32))
        emb = nn.silu(EDMLinear(emb_channels, name="map_layer0")(emb))
        emb = EDMLinear(emb_channels, name="map_layer1")(emb)
        if self.label_dim:
            assert class_labels is not None
            # sqrt(label_dim) gain lives in the INIT weight, not the forward
            # (reference networks.py:400 init_weight=np.sqrt(label_dim)).
            emb = emb + EDMLinear(
                emb_channels, use_bias=False,
                init_scale=float(np.sqrt(self.label_dim)), name="map_label",
            )(class_labels.astype(jnp.float32))
        emb = nn.silu(emb)

        skips = []
        h = x
        for level, mult in enumerate(self.channel_mult):
            res = self.img_resolution >> level
            if level == 0:
                # Level-0 conv already uses this level's mult (ref :410).
                h = EDMConv(self.model_channels * mult, 3, name=f"enc_{res}_conv")(h)
                skips.append(h)
            else:
                # Down block keeps the previous level's width (in == out).
                h = EDMUNetBlock(c_out, down=True, name=f"enc_{res}_down", **block)(h, emb)
                skips.append(h)
            c_out = self.model_channels * mult
            for idx in range(self.num_blocks):
                h = EDMUNetBlock(
                    c_out, attention=(res in self.attn_resolutions),
                    name=f"enc_{res}_block{idx}", **block,
                )(h, emb)
                skips.append(h)

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            res = self.img_resolution >> level
            c_out = self.model_channels * mult
            if level == len(self.channel_mult) - 1:
                h = EDMUNetBlock(h.shape[-1], attention=True, name=f"dec_{res}_in0", **block)(h, emb)
                h = EDMUNetBlock(h.shape[-1], name=f"dec_{res}_in1", **block)(h, emb)
            else:
                h = EDMUNetBlock(h.shape[-1], up=True, name=f"dec_{res}_up", **block)(h, emb)
            for idx in range(self.num_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = EDMUNetBlock(
                    c_out, attention=(res in self.attn_resolutions),
                    name=f"dec_{res}_block{idx}", **block,
                )(h, emb)
        assert not skips
        h = EDMGroupNorm(silu=True, name="out_norm")(h)
        return EDMConv(self.out_channels, 3, init_scale=0.0, name="out_conv")(h)


# ---------------------------------------------------------------------------
# Preconditioners (sigma-parameterised wrappers)


class _PrecondBase:
    """model(x, sigma) -> D(x; sigma) = c_skip x + c_out F(c_in x, c_noise)."""

    def __init__(self, unet: nn.Module, params: dict):
        self.unet = unet
        self.params = params

    def _apply(self, x, c_in, c_noise, class_labels=None, **kw):
        return self.unet.apply(
            {"params": self.params}, (c_in * x.astype(jnp.float32)), c_noise,
            class_labels, **kw,
        ).astype(jnp.float32)


class EDMPrecond(_PrecondBase):
    def __init__(self, unet, params, sigma_data: float = 0.5,
                 sigma_min: float = 0.0, sigma_max: float = float("inf")):
        super().__init__(unet, params)
        self.sigma_data = sigma_data
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max

    def __call__(self, x, sigma, class_labels=None):
        sigma = jnp.asarray(sigma, jnp.float32).reshape(-1, 1, 1, 1)
        sd2 = self.sigma_data**2
        c_skip = sd2 / (sigma**2 + sd2)
        c_out = sigma * self.sigma_data / jnp.sqrt(sigma**2 + sd2)
        c_in = 1.0 / jnp.sqrt(sd2 + sigma**2)
        c_noise = jnp.log(sigma.reshape(-1)) / 4.0
        fx = self._apply(x, c_in, c_noise, class_labels)
        return c_skip * x.astype(jnp.float32) + c_out * fx

    def round_sigma(self, sigma):
        return jnp.asarray(sigma, jnp.float32)


class VPPrecond(_PrecondBase):
    def __init__(self, unet, params, beta_d: float = 19.9, beta_min: float = 0.1,
                 M: int = 1000, epsilon_t: float = 1e-5):
        super().__init__(unet, params)
        self.beta_d, self.beta_min, self.M, self.epsilon_t = beta_d, beta_min, M, epsilon_t
        self.sigma_min = float(self.sigma(epsilon_t))
        self.sigma_max = float(self.sigma(1.0))

    def sigma(self, t):
        t = jnp.asarray(t, jnp.float32)
        return jnp.sqrt(jnp.exp(0.5 * self.beta_d * t**2 + self.beta_min * t) - 1.0)

    def sigma_inv(self, sigma):
        sigma = jnp.asarray(sigma, jnp.float32)
        return (
            jnp.sqrt(self.beta_min**2 + 2 * self.beta_d * jnp.log(1 + sigma**2))
            - self.beta_min
        ) / self.beta_d

    def __call__(self, x, sigma, class_labels=None):
        sigma = jnp.asarray(sigma, jnp.float32).reshape(-1, 1, 1, 1)
        c_skip = jnp.ones_like(sigma)
        c_out = -sigma
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        c_noise = ((self.M - 1) * self.sigma_inv(sigma.reshape(-1))).astype(jnp.float32)
        fx = self._apply(x, c_in, c_noise, class_labels)
        return c_skip * x.astype(jnp.float32) + c_out * fx

    def round_sigma(self, sigma):
        return jnp.asarray(sigma, jnp.float32)


class VEPrecond(_PrecondBase):
    def __init__(self, unet, params, sigma_min: float = 0.02, sigma_max: float = 100.0):
        super().__init__(unet, params)
        self.sigma_min, self.sigma_max = sigma_min, sigma_max

    def __call__(self, x, sigma, class_labels=None):
        sigma = jnp.asarray(sigma, jnp.float32).reshape(-1, 1, 1, 1)
        c_skip = jnp.ones_like(sigma)
        c_out = sigma
        c_in = jnp.ones_like(sigma)
        c_noise = jnp.log(0.5 * sigma.reshape(-1))
        fx = self._apply(x, c_in, c_noise, class_labels)
        return c_skip * x.astype(jnp.float32) + c_out * fx

    def round_sigma(self, sigma):
        return jnp.asarray(sigma, jnp.float32)


class iDDPMPrecond(_PrecondBase):
    def __init__(self, unet, params, C_1: float = 0.001, C_2: float = 0.008, M: int = 1000):
        super().__init__(unet, params)
        self.C_1, self.C_2, self.M = C_1, C_2, M
        # f32 recursion, op-for-op like the reference (networks.py:596-599):
        # the u table IS the sigma grid, so rounding must match for
        # round_sigma indices to agree.
        one = np.float32(1.0)

        def alpha_bar(j):
            a = np.float32(0.5 * np.pi) * np.float32(j) / np.float32(M)
            a = a / np.float32(C_2 + 1)
            return np.float32(np.sin(a)) ** 2

        u = np.zeros(M + 1, dtype=np.float32)
        for j in range(M, 0, -1):
            ratio = np.maximum(alpha_bar(j - 1) / alpha_bar(j), np.float32(C_1))
            u[j - 1] = np.sqrt((u[j] * u[j] + one) / ratio - one)
        self.u = jnp.asarray(u, jnp.float32)
        self.sigma_min = float(u[M - 1])
        self.sigma_max = float(u[0])

    def round_sigma(self, sigma, return_index: bool = False):
        sigma = jnp.asarray(sigma, jnp.float32).reshape(-1)
        dist = jnp.abs(sigma[:, None] - self.u[None, :])
        index = jnp.argmin(dist, axis=1)
        return index if return_index else self.u[index]

    def __call__(self, x, sigma, class_labels=None):
        sigma = jnp.asarray(sigma, jnp.float32).reshape(-1, 1, 1, 1)
        c_skip = jnp.ones_like(sigma)
        c_out = -sigma
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        index = self.round_sigma(sigma.reshape(-1), return_index=True)
        c_noise = (self.M - 1 - index).astype(jnp.float32)
        fx = self._apply(x, c_in, c_noise, class_labels)
        # iDDPM nets emit 2*img_channels (mean + variance); D_x keeps the mean
        # half (reference networks.py:617).
        fx = fx[..., : x.shape[-1]]
        return c_skip * x.astype(jnp.float32) + c_out * fx


PRECONDS = {
    "vp": VPPrecond,
    "ve": VEPrecond,
    "iddpm": iDDPMPrecond,
    "edm": EDMPrecond,
}
