"""StyleGAN shared layers (Flax).

Capability parity with reference ``networks/shared.py`` (FullyConnectedLayer
with the lr-multiplier trick :29-67, MLP :70-97, ResidualBlock :20-26).
The runtime weight scaling (``weight_gain = lr_multiplier / sqrt(fan_in)``,
bias gain = lr_multiplier) and the fused bias+activation path through
``ops.bias_act`` (N1) are preserved.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import ops


def normalize_2nd_moment(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """x / sqrt(mean(x^2)) (reference generator.py:35)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


class FullyConnectedLayer(nn.Module):
    out_features: int
    activation: str = "linear"
    bias: bool = True
    lr_multiplier: float = 1.0
    weight_init: float = 1.0
    bias_init: Union[float, Sequence[float]] = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        w = self.param(
            "weight",
            lambda k, s: jax.random.normal(k, s) * (self.weight_init / self.lr_multiplier),
            (self.out_features, in_features),
        )
        weight_gain = self.lr_multiplier / np.sqrt(in_features)
        y = x @ (w.T * weight_gain).astype(x.dtype)
        b = None
        if self.bias:
            binit = np.broadcast_to(
                np.asarray(self.bias_init, dtype=np.float32), (self.out_features,)
            )
            b = self.param(
                "bias", lambda k, s: jnp.asarray(binit / self.lr_multiplier), (self.out_features,)
            )
            b = (b * self.lr_multiplier).astype(x.dtype)
        return ops.bias_act(y, b, dim=y.ndim - 1, act=self.activation)


class MLP(nn.Module):
    """Stack of FullyConnectedLayers (reference MLP:70).

    ``features_list`` gives layer widths [in, h1, ..., out]; input of other
    width is projected by the first layer anyway (flax infers fan-in).
    """

    features_list: Sequence[int]
    activation: str = "lrelu"
    lr_multiplier: float = 1.0
    linear_out: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        num_layers = len(self.features_list) - 1
        squeeze = x.ndim == 3
        if squeeze:
            b, n, c = x.shape
            x = x.reshape(b * n, c)
        for idx in range(num_layers):
            act = (
                "linear"
                if (self.linear_out and idx == num_layers - 1)
                else self.activation
            )
            x = FullyConnectedLayer(
                self.features_list[idx + 1], activation=act,
                lr_multiplier=self.lr_multiplier, name=f"fc{idx}",
            )(x)
        if squeeze:
            x = x.reshape(b, n, -1)
        return x


class ResidualBlock(nn.Module):
    """(x + fn(x)) / sqrt(2) wrapper (reference ResidualBlock:20)."""

    fn: nn.Module

    def __call__(self, x: jnp.ndarray, *args, **kwargs) -> jnp.ndarray:
        return (self.fn(x, *args, **kwargs) + x) * float(np.sqrt(0.5))
