"""StyleGAN-T generator (Flax, TPU ops) — text-conditional GAN generator.

Capability parity with reference ``networks/generator.py`` (modulated_conv2d
:39, StyleSplit :104, SynthesisInput :115, SynthesisLayer :199, ToRGBLayer
:293, SynthesisBlock :325, SynthesisNetwork :437, MappingNetwork :496,
Generator :559 — the SiD/StyleGAN-T lineage net of SURVEY.md §2.4).

TPU-first choices:
- modulated conv runs the *unfused* formulation (scale activations by styles,
  one big batched conv, demodulate outputs) — mathematically identical to the
  reference's per-sample grouped conv but keeps one large MXU conv instead of
  B tiny groups; up/down resampling composes with ``ops.upfirdn2d`` (N2).
- activations go through ``ops.bias_act`` (N1) with the StyleGAN gain/clamp
  discipline (conv_clamp 256, lrelu gain sqrt(2)).
- text conditioning takes a precomputed embedding vector (the framework's
  CLIP towers replace the runtime open_clip dependency of the reference
  MappingNetwork:496); ``w = concat([mapped_z, c])``.
- the W moving average lives in a ``stats`` variable collection (mutable only
  when training), replacing the in-place buffer lerp.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from .stylegan_shared import MLP, FullyConnectedLayer, normalize_2nd_moment


def modulated_conv2d(
    x: jnp.ndarray,  # (B, C_in, H, W)  NCHW like the ops layer
    weight: jnp.ndarray,  # (C_out, C_in, kh, kw)
    styles: jnp.ndarray,  # (B, C_in)
    noise: Optional[jnp.ndarray] = None,
    up: int = 1,
    padding: int = 0,
    resample_filter: Optional[jnp.ndarray] = None,
    demodulate: bool = True,
) -> jnp.ndarray:
    """Style modulation -> conv -> demodulation (+noise).

    Unfused formulation of reference modulated_conv2d:39-97 (their
    ``fused_modconv=False`` branch, exactly equal in f32): scale inputs by
    per-sample styles, convolve with the shared kernel, rescale outputs by
    the demodulation coefficients computed from (weight x styles).
    """
    b, c_in, _, _ = x.shape
    c_out, _, kh, kw = weight.shape
    dcoefs = None
    if demodulate:
        w = weight[None] * styles.reshape(b, 1, c_in, 1, 1)  # (B, O, I, kh, kw)
        dcoefs = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=(2, 3, 4)) + 1e-8)  # (B, O)
    x = x * styles.reshape(b, c_in, 1, 1).astype(x.dtype)
    kernel = weight
    conv_pad = padding
    if up > 1:
        # Single up-front padding like conv2d_resample (torch_utils/ops/
        # conv2d_resample.py:96-99,125-140): pad+zero-stuff+FIR in one
        # upfirdn2d, then an unpadded conv.  Padding between the stages would
        # differ at the boundary (hard zeros instead of the FIR tail).
        fw = resample_filter.shape[-1]
        p0 = (fw + up - 1) // 2 + padding
        p1 = (fw - up) // 2 + padding
        x = ops.upfirdn2d(x, resample_filter, up=up, padding=(p0, p1, p0, p1),
                          gain=up * up)
        conv_pad = 0
        # The reference runs up>1 through transposed conv with the raw kernel
        # (flip_weight=(up==1), generator.py:270), i.e. CONVOLUTION semantics:
        # flip the kernel before our correlation-based lax conv.
        kernel = kernel[:, :, ::-1, ::-1]
    x = jax.lax.conv_general_dilated(
        x, jnp.transpose(kernel, (2, 3, 1, 0)).astype(x.dtype), (1, 1),
        ((conv_pad, conv_pad), (conv_pad, conv_pad)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )
    if demodulate:
        x = x * dcoefs.reshape(b, c_out, 1, 1).astype(x.dtype)
    if noise is not None:
        x = x + noise.astype(x.dtype)
    return x


class StyleSplit(nn.Module):
    """w -> 3-way projection m1*m2+m3 (reference StyleSplit:104)."""

    out_channels: int
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, w: jnp.ndarray) -> jnp.ndarray:
        y = FullyConnectedLayer(
            3 * self.out_channels, bias_init=self.bias_init, name="proj"
        )(w)
        m1, m2, m3 = jnp.split(y, 3, axis=-1)
        return m1 * m2 + m3


class SynthesisInput(nn.Module):
    """Learned-transform Fourier-feature input grid (reference :115-196)."""

    w_dim: int
    channels: int
    size: int
    sampling_rate: int
    bandwidth: float

    @nn.compact
    def __call__(self, w: jnp.ndarray) -> jnp.ndarray:
        def freq_init(key, shape):
            f = jax.random.normal(key, shape)
            radii = jnp.sqrt(jnp.sum(jnp.square(f), axis=1, keepdims=True))
            f = f / (radii * jnp.exp(radii**2) ** 0.25)
            return f * self.bandwidth

        freqs = self.param("freqs", freq_init, (self.channels, 2))
        phases = self.param(
            "phases", lambda k, s: jax.random.uniform(k, s) - 0.5, (self.channels,)
        )
        weight = self.param(
            "weight", nn.initializers.normal(1.0), (self.channels, self.channels)
        )
        t = FullyConnectedLayer(
            4, weight_init=0.0, bias_init=[1, 0, 0, 0], name="affine"
        )(w)  # (B, 4): rotation cos/sin + translation
        t = t / jnp.linalg.norm(t[:, :2], axis=1, keepdims=True)
        # Transformed frequencies/phases (rotation then translation).
        rc, rs, tx, ty = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
        rot = jnp.stack(
            [jnp.stack([rc, -rs], -1), jnp.stack([rs, rc], -1)], axis=1
        )  # (B, 2, 2)
        f = jnp.einsum("cd,bde->bce", freqs, rot)  # (B, C, 2)
        ph = phases[None] + f[:, :, 0] * (-tx[:, None]) + f[:, :, 1] * (-ty[:, None])
        amplitudes = jnp.clip(
            1
            - (jnp.linalg.norm(f, axis=2) - self.bandwidth)
            / (self.sampling_rate / 2 - self.bandwidth),
            0.0,
            1.0,
        )
        # Sampling grid, align_corners=False semantics, scaled by size/(2*sr).
        coords = (jnp.arange(self.size) + 0.5) / self.size * 2.0 - 1.0
        scale = 0.5 * self.size / self.sampling_rate
        gx, gy = jnp.meshgrid(coords * scale, coords * scale, indexing="xy")
        grid = jnp.stack([gx, gy], axis=-1)  # (H, W, 2)
        x = jnp.einsum("hwd,bcd->bhwc", grid, f) + ph[:, None, None, :]
        x = jnp.sin(x * (2.0 * jnp.pi)) * amplitudes[:, None, None, :]
        x = x @ (weight.T / np.sqrt(self.channels))
        return jnp.transpose(x, (0, 3, 1, 2))  # NCHW


class SynthesisLayer(nn.Module):
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = 256.0
    layer_scale_init: float = 1e-5
    residual: bool = False
    gn_groups: int = 32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, w: jnp.ndarray, rng: Optional[jax.Array] = None,
        gain: float = 1.0,
    ) -> jnp.ndarray:
        c_in = x.shape[1]
        weight = self.param(
            "weight", nn.initializers.normal(1.0),
            (self.out_channels, c_in, self.kernel_size, self.kernel_size),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        styles = StyleSplit(c_in, bias_init=1.0, name="affine")(w)
        noise = None
        if self.use_noise:
            strength = self.param("noise_strength", nn.initializers.zeros, ())
            if rng is not None:
                noise = (
                    jax.random.normal(rng, (x.shape[0], 1, self.resolution, self.resolution))
                    * strength
                )
            else:
                const = self.param(
                    "noise_const", nn.initializers.normal(1.0),
                    (self.resolution, self.resolution),
                )
                noise = const[None, None] * strength
        if self.residual:
            gamma = self.param(
                "gamma", lambda k, s: jnp.full(s, self.layer_scale_init),
                (1, self.out_channels, 1, 1),
            )
            xs = jnp.transpose(x, (0, 2, 3, 1))
            scale = self.param("gn_scale", nn.initializers.ones, (c_in,))
            bias_gn = self.param("gn_bias", nn.initializers.zeros, (c_in,))
            xs = ops.group_norm(xs, scale, bias_gn, num_groups=min(self.gn_groups, c_in))
            x = jnp.transpose(xs, (0, 3, 1, 2))
        f = ops.setup_filter(list(self.resample_filter))
        y = modulated_conv2d(
            x, weight, styles, noise=noise, up=self.up,
            padding=self.kernel_size // 2, resample_filter=f,
        )
        act_gain = ops.activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        y = ops.bias_act(y, bias.astype(y.dtype), dim=1, act=self.activation,
                         gain=act_gain, clamp=act_clamp)
        if self.residual:
            # The residual adds the POST-GroupNorm x (reference
            # generator.py:285-287: x is reassigned to norm(x) before the
            # conv, and y.add_(x) uses that).
            y = (gamma * y + x) * float(np.sqrt(2))
        return y


class ToRGBLayer(nn.Module):
    img_channels: int
    conv_clamp: Optional[float] = 256.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[1]
        weight = self.param(
            "weight", lambda k, s: 0.1 * jax.random.normal(k, s),
            (self.img_channels, c_in, 1, 1),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.img_channels,))
        styles = StyleSplit(c_in, bias_init=1.0, name="affine")(w) / np.sqrt(c_in)
        y = modulated_conv2d(x, weight, styles, demodulate=False)
        return ops.bias_act(y, bias.astype(y.dtype), dim=1, clamp=self.conv_clamp)


class SynthesisBlock(nn.Module):
    in_channels: int  # 0 = first block
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    num_res_blocks: int = 1
    architecture: str = "skip"
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    conv_clamp: float = 256.0

    @property
    def num_conv(self) -> int:
        return 1 + 2 * self.num_res_blocks

    @nn.compact
    def __call__(self, x, img, ws, rng: Optional[jax.Array] = None):
        w_idx = 0

        def next_w():
            nonlocal w_idx
            w = ws[:, w_idx]
            w_idx += 1
            return w

        def next_rng():
            nonlocal rng
            if rng is None:
                return None
            rng, sub = jax.random.split(rng)
            return sub

        layer = lambda **kw: SynthesisLayer(
            w_dim=self.w_dim, resolution=self.resolution,
            resample_filter=self.resample_filter, conv_clamp=self.conv_clamp, **kw
        )
        if self.in_channels == 0:
            x = SynthesisInput(
                self.w_dim, self.out_channels, self.resolution,
                sampling_rate=self.resolution, bandwidth=2, name="input",
            )(next_w())
            gain0 = float(np.sqrt(0.5))
        else:
            x = layer(out_channels=self.out_channels, up=2, name="conv0")(
                x, next_w(), rng=next_rng()
            )
            gain0 = float(np.sqrt(0.5))
        for i in range(self.num_res_blocks):
            x = layer(out_channels=self.out_channels, name=f"convs1_{2*i}")(
                x, next_w(), rng=next_rng(), gain=gain0
            )
            x = layer(out_channels=self.out_channels, residual=True,
                      name=f"convs1_{2*i+1}")(x, next_w(), rng=next_rng(), gain=gain0)
        if img is not None:
            f = ops.setup_filter(list(self.resample_filter))
            img = ops.upsample2d(img, f)
        if self.is_last or self.architecture == "skip":
            y = ToRGBLayer(self.img_channels, self.conv_clamp, name="torgb")(
                x, ws[:, w_idx]
            ).astype(jnp.float32)
            img = img + y if img is not None else y
        return x, img


class SynthesisNetwork(nn.Module):
    w_dim: int
    img_resolution: int
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    base_mult: int = 3  # start resolution exponent (SG-T: 3 -> 8x8)
    num_res_blocks: int = 3

    @property
    def block_resolutions(self):
        log2 = int(np.log2(self.img_resolution))
        return [2**i for i in range(self.base_mult, log2 + 1)]

    @property
    def num_ws(self) -> int:
        n = 0
        for res in self.block_resolutions:
            n += 1 + 2 * self.num_res_blocks
        return n + 1  # + final torgb

    @nn.compact
    def __call__(self, ws: jnp.ndarray, rng: Optional[jax.Array] = None) -> jnp.ndarray:
        channels = {
            res: min(self.channel_base // res, self.channel_max)
            for res in self.block_resolutions
        }
        x = img = None
        w_idx = 0
        for res in self.block_resolutions:
            in_ch = channels[res // 2] if res > self.block_resolutions[0] else 0
            is_last = res == self.img_resolution
            block = SynthesisBlock(
                in_ch, channels[res], w_dim=self.w_dim, resolution=res,
                img_channels=self.img_channels, is_last=is_last,
                num_res_blocks=self.num_res_blocks, name=f"b{res}",
            )
            n = block.num_conv + 1
            sub = None
            if rng is not None:
                rng, sub = jax.random.split(rng)
            x, img = block(x, img, ws[:, w_idx : w_idx + n], rng=sub)
            w_idx += block.num_conv
        return img


class MappingNetwork(nn.Module):
    """z (+ text embedding c) -> broadcast W (reference MappingNetwork:496).

    ``c`` is a precomputed conditioning embedding (e.g. pooled CLIP text
    features); pass None for unconditional models.
    """

    z_dim: int
    c_dim: int = 0
    num_ws: int = 1
    num_layers: int = 2
    lr_multiplier: float = 0.01
    x_avg_beta: float = 0.995

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,
        c: Optional[jnp.ndarray] = None,
        truncation_psi: float = 1.0,
        update_avg: bool = False,
    ) -> jnp.ndarray:
        x = MLP(
            [self.z_dim] * (self.num_layers + 1), lr_multiplier=self.lr_multiplier,
            linear_out=True, name="mlp",
        )(normalize_2nd_moment(z))
        x_avg = self.variable(
            "stats", "x_avg", lambda: jnp.zeros((self.z_dim,), jnp.float32)
        )
        if update_avg and not self.is_initializing():
            x_avg.value = (
                jnp.mean(x, axis=0) * (1 - self.x_avg_beta) + x_avg.value * self.x_avg_beta
            )
        if truncation_psi != 1.0:
            x = x_avg.value[None] + truncation_psi * (x - x_avg.value[None])
        if self.c_dim > 0:
            assert c is not None and c.shape[-1] == self.c_dim
            w = jnp.concatenate([x, c.astype(x.dtype)], axis=1)
        else:
            w = x
        return jnp.repeat(w[:, None], self.num_ws, axis=1)


class Generator(nn.Module):
    """Text-conditional StyleGAN-T generator (reference Generator:559)."""

    z_dim: int = 64
    c_dim: int = 0  # conditioning embedding width (0 = unconditional)
    img_resolution: int = 64
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    num_res_blocks: int = 3

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,
        c: Optional[jnp.ndarray] = None,
        truncation_psi: float = 1.0,
        rng: Optional[jax.Array] = None,
        update_avg: bool = False,
    ) -> jnp.ndarray:
        synthesis = SynthesisNetwork(
            w_dim=self.z_dim + self.c_dim,
            img_resolution=self.img_resolution,
            img_channels=self.img_channels,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
            num_res_blocks=self.num_res_blocks,
            name="synthesis",
        )
        ws = MappingNetwork(
            self.z_dim, self.c_dim, num_ws=synthesis.num_ws, name="mapping"
        )(z, c, truncation_psi=truncation_psi, update_avg=update_avg)
        return synthesis(ws, rng=rng)
