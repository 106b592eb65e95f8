"""Projected DINO-ViT discriminator (Flax) — the SiDA adversarial head.

Capability parity with reference ``networks/discriminator.py`` (DINO:107,
ProjectedDiscriminator:130, DiscHead:78, SpectralConv1d:29, BatchNormLocal:35)
and ``networks/vit_utils.py`` (ViT backbone with multi-layer activation
hooks).  Re-designed in Flax:

- the DINO ViT-S/16 backbone is implemented natively (patch 16, width 384,
  6 heads, 12 blocks) with token-sequence taps after blocks [2,5,8,11] plus
  the patch embedding ("hook_patch"), replacing the timm model surgery;
  ``convert_dino`` maps a timm/dino state dict for pretrained weights.
- spectral normalisation runs one power iteration per call with the ``u``
  vector in a ``spectral`` variable collection (the torch SpectralNorm hook).
- DiffAugment (color / translation / cutout) is a pure-jnp function driven by
  an explicit rng, replacing the in-place torch augments.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .stylegan_shared import FullyConnectedLayer

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 384
    layers: int = 12
    heads: int = 6
    mlp_ratio: float = 4.0
    hooks: Tuple[int, ...] = (2, 5, 8, 11)
    hook_patch: bool = True


DINO_VIT_S16 = ViTConfig()
TINY_VIT = ViTConfig(image_size=32, patch_size=8, width=32, layers=4, heads=2,
                     hooks=(1, 3), hook_patch=True)


class _ViTBlock(nn.Module):
    width: int
    heads: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(name="norm1")(x)
        b, n, c = h.shape
        qkv = nn.Dense(3 * c, name="qkv")(h).reshape(b, n, 3, self.heads, c // self.heads)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        from .. import ops

        attn = ops.attention(q, k, v).transpose(0, 2, 1, 3).reshape(b, n, c)
        x = x + nn.Dense(c, name="proj")(attn)
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(int(c * self.mlp_ratio), name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c, name="fc2")(h)
        return x + h


class DINOViT(nn.Module):
    """ViT backbone returning hooked token activations (B, C, N) per tap."""

    config: ViTConfig = DINO_VIT_S16

    @nn.compact
    def __call__(self, pixels01: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        x = (pixels01 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        if x.shape[1] != cfg.image_size:
            # Area interpolation like the reference DINO preprocessing.
            x = jax.image.resize(
                x, (x.shape[0], cfg.image_size, cfg.image_size, 3), method="linear"
            )
        x = nn.Conv(
            cfg.width, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), name="patch_embed",
        )(x)
        b, gh, gw, c = x.shape
        tokens = x.reshape(b, gh * gw, c)
        feats: Dict[str, jnp.ndarray] = {}
        tap = 0
        if cfg.hook_patch:
            feats[str(tap)] = jnp.swapaxes(tokens, 1, 2)  # (B, C, N)
            tap += 1
        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, c))
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, gh * gw + 1, c)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c)), tokens], axis=1) + pos
        for i in range(cfg.layers):
            x = _ViTBlock(cfg.width, cfg.heads, cfg.mlp_ratio, name=f"blocks_{i}")(x)
            if i in cfg.hooks:
                feats[str(tap)] = jnp.swapaxes(x[:, 1:], 1, 2)  # drop CLS
                tap += 1
        return feats

    @property
    def n_hooks(self) -> int:
        return len(self.config.hooks) + int(self.config.hook_patch)


class SpectralConv1d(nn.Module):
    """Circular conv1d over tokens with spectral normalisation (one power
    iteration per call, u persisted in the 'spectral' collection).

    ``power_iters`` > 1 runs extra v/u sweeps per call — the STATELESS mode
    used inside the jitted distillation step (``training/distill.py`` pixel
    tower), where u stays at its init value instead of persisting across
    steps and a single iteration from a fixed vector would under-estimate
    sigma as the kernel drifts."""

    features: int
    kernel_size: int = 1
    power_iters: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_u: bool = False) -> jnp.ndarray:
        # x: (B, C, N)
        c_in = x.shape[1]
        w = self.param(
            "kernel", nn.initializers.he_uniform(),
            (self.features, c_in * self.kernel_size),
        )
        u = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(jax.random.PRNGKey(0), (self.features,)),
        )
        u_new = u.value
        for _ in range(self.power_iters):
            v = w.T @ u_new
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u_new = w @ v
            u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
        if update_u and not self.is_initializing():
            u.value = jax.lax.stop_gradient(u_new)
        sigma = u_new @ w @ v
        w_sn = (w / sigma).reshape(self.features, c_in, self.kernel_size)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.kernel_size > 1:
            p = self.kernel_size // 2
            x = jnp.concatenate([x[..., -p:], x, x[..., :p]], axis=-1)  # circular
        y = jax.lax.conv_general_dilated(
            x, jnp.transpose(w_sn, (2, 1, 0)), (1,), "VALID",
            dimension_numbers=("NCH", "HIO", "NCH"),
        )
        return y + bias[None, :, None]


class BatchNormLocal(nn.Module):
    """Virtual-batch norm over (group, tokens) (reference :35-61)."""

    virtual_bs: int = 8
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, c, n = x.shape
        g = max(b // self.virtual_bs, 1)
        xg = x.reshape(g, -1, c, n)
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        x = xg.reshape(b, c, n)
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * weight[None, :, None] + bias[None, :, None]


class _HeadBlock(nn.Module):
    channels: int
    kernel_size: int
    power_iters: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_u: bool = False) -> jnp.ndarray:
        x = SpectralConv1d(self.channels, self.kernel_size,
                           power_iters=self.power_iters, name="conv")(x, update_u)
        x = BatchNormLocal(name="bn")(x)
        return jnp.where(x >= 0, x, 0.2 * x)  # leaky relu 0.2


class DiscHead(nn.Module):
    channels: int
    c_dim: int
    cmap_dim: int = 64
    power_iters: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: Optional[jnp.ndarray],
                 update_u: bool = False) -> jnp.ndarray:
        h = _HeadBlock(self.channels, 1, self.power_iters, name="main0")(x, update_u)
        r = _HeadBlock(self.channels, 9, self.power_iters, name="main1")(h, update_u)
        h = (h + r) * float(np.sqrt(0.5))
        if self.c_dim > 0:
            out = SpectralConv1d(self.cmap_dim, 1,
                                 power_iters=self.power_iters, name="cls")(h, update_u)
            cmap = FullyConnectedLayer(self.cmap_dim, name="cmapper")(c)[..., None]
            return jnp.sum(out * cmap, axis=1, keepdims=True) / np.sqrt(self.cmap_dim)
        return SpectralConv1d(1, 1, power_iters=self.power_iters,
                              name="cls")(h, update_u)


def refresh_spectral_u(disc_params: dict, spectral: dict, iters: int = 3) -> dict:
    """Advance every head's power-iteration vector ``u`` against the CURRENT
    kernels — the persistent-``u`` semantics of torch ``spectral_norm``
    (reference ``networks/discriminator.py:78-105`` wraps its convs in
    ``torch.nn.utils.spectral_norm``, whose ``u`` buffer persists and tracks
    the drifting kernel across steps).

    Inside the jitted distillation step the estimate is stateless — ``iters``
    sweeps from whatever ``u`` rides in the replicated ``disc_frozen`` batch
    entry.  From the INIT ``u`` that under-estimates sigma by 6-11% once the
    kernels drift (measured, tests/test_stylegan_t.py); refreshed every step
    by the Trainer, ``u`` stays converged and the in-step estimate lands
    within ~1% of the exact SVD.  Pure function: jit it and feed the NEXT
    step's batch (one-step lag, same as torch's half-step lag).

    Tree-walks ``spectral`` (paths ``.../conv/u`` mirroring ``.../conv/
    {kernel,bias}`` in ``disc_params``), so it never hardcodes head names.
    """

    def walk(sp, pp):
        out = {}
        for k, v in sp.items():
            if k == "u":
                w = pp["kernel"]  # (features, c_in * kernel_size)
                u = v
                for _ in range(iters):
                    vv = w.T @ u
                    vv = vv / (jnp.linalg.norm(vv) + 1e-12)
                    u = w @ vv
                    u = u / (jnp.linalg.norm(u) + 1e-12)
                out[k] = u
            else:
                out[k] = walk(v, pp[k])
        return out

    return walk(spectral, disc_params)


def diff_augment(rng: jax.Array, x: jnp.ndarray,
                 policy: Sequence[str] = ("color", "translation", "cutout")) -> jnp.ndarray:
    """DiffAugment on NCHW images in [-1,1] (differentiable, rng-driven)."""
    b, c, h, w = x.shape
    for name in policy:
        rng, r1, r2, r3 = jax.random.split(rng, 4)
        if name == "color":
            x = x + (jax.random.uniform(r1, (b, 1, 1, 1)) - 0.5)  # brightness
            mean = x.mean(axis=1, keepdims=True)
            x = (x - mean) * (jax.random.uniform(r2, (b, 1, 1, 1)) * 2) + mean  # saturation
            mean = x.mean(axis=(1, 2, 3), keepdims=True)
            x = (x - mean) * (jax.random.uniform(r3, (b, 1, 1, 1)) + 0.5) + mean  # contrast
        elif name == "translation":
            shift_y = jax.random.randint(r1, (b,), -(h // 8), h // 8 + 1)
            shift_x = jax.random.randint(r2, (b,), -(w // 8), w // 8 + 1)
            yy = jnp.clip(jnp.arange(h)[None, :] + shift_y[:, None], 0, h - 1)
            xx = jnp.clip(jnp.arange(w)[None, :] + shift_x[:, None], 0, w - 1)
            x = jax.vmap(lambda img, ys, xs: img[:, ys][:, :, xs])(x, yy, xx)
        elif name == "cutout":
            cy = jax.random.randint(r1, (b,), 0, h)
            cx = jax.random.randint(r2, (b,), 0, w)
            ch, cw = h // 2, w // 2
            gy = jnp.arange(h)[None, :, None]
            gx = jnp.arange(w)[None, None, :]
            mask = (
                (jnp.abs(gy - cy[:, None, None]) >= ch // 2)
                | (jnp.abs(gx - cx[:, None, None]) >= cw // 2)
            )
            x = x * mask[:, None].astype(x.dtype)
    return x


class ProjectedDiscriminator(nn.Module):
    """DINO features -> per-hook spectral conv heads (reference :130-175)."""

    c_dim: int
    vit: ViTConfig = DINO_VIT_S16
    diffaug: bool = True
    power_iters: int = 1

    @nn.compact
    def __call__(
        self,
        x_nchw: jnp.ndarray,  # images in [-1, 1], NCHW (GAN convention)
        c: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        update_u: bool = False,
    ) -> jnp.ndarray:
        if self.diffaug and rng is not None:
            x_nchw = diff_augment(rng, x_nchw)
        x01 = jnp.transpose(x_nchw, (0, 2, 3, 1)) * 0.5 + 0.5
        feats = DINOViT(self.vit, name="dino")(x01)
        logits = []
        for key in sorted(feats, key=int):
            out = DiscHead(self.vit.width, self.c_dim,
                           power_iters=self.power_iters, name=f"head_{key}")(
                feats[key], c, update_u
            )
            logits.append(out.reshape(x_nchw.shape[0], -1))
        return jnp.concatenate(logits, axis=1)


def convert_dino(state_dict, cfg: ViTConfig = DINO_VIT_S16) -> dict:
    """timm/dino ViT state dict -> DINOViT params."""
    sd = {k: np.asarray(v, np.float32) for k, v in state_dict.items()}
    t = lambda w: np.ascontiguousarray(w.T)
    tree = {
        "patch_embed": {
            "kernel": np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0)),
            "bias": sd["patch_embed.proj.bias"],
        },
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
    }
    for i in range(cfg.layers):
        p = f"blocks.{i}"
        tree[f"blocks_{i}"] = {
            "norm1": {"scale": sd[f"{p}.norm1.weight"], "bias": sd[f"{p}.norm1.bias"]},
            "norm2": {"scale": sd[f"{p}.norm2.weight"], "bias": sd[f"{p}.norm2.bias"]},
            "qkv": {"kernel": t(sd[f"{p}.attn.qkv.weight"]), "bias": sd[f"{p}.attn.qkv.bias"]},
            "proj": {"kernel": t(sd[f"{p}.attn.proj.weight"]), "bias": sd[f"{p}.attn.proj.bias"]},
            "fc1": {"kernel": t(sd[f"{p}.mlp.fc1.weight"]), "bias": sd[f"{p}.mlp.fc1.bias"]},
            "fc2": {"kernel": t(sd[f"{p}.mlp.fc2.weight"]), "bias": sd[f"{p}.mlp.fc2.bias"]},
        }
    return tree
