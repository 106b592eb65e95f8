"""InceptionV3 (FID variant) in Flax — the 2048-d feature extractor for FID.

Role of the reference's downloaded NVIDIA TorchScript InceptionV3
(``metrics/sid_metric_utils.py:get_feature_detector:98``,
``sid_fid_and_clip.py:36``).  The graph follows the canonical FID detector
(TF-Slim InceptionV3 as replicated by pytorch-fid): torchvision topology with
the FID-specific pooling details —

- branch-pool average pooling uses ``count_include_pad=False`` semantics,
- the final InceptionE block (Mixed_7c) uses MAX pooling in its pool branch,
- features = global average pool of Mixed_7c (2048-d), no classifier.

Inputs are uint8 RGB; preprocessing matches the detector contract: bilinear
resize to 299x299 and scale to [-1, 1].  BatchNorm is folded at convert time
(inference-only), so the Flax module is pure conv+relu — one fused inference
graph for XLA.  ``convert_inception`` maps a torchvision/pytorch-fid state
dict; without a weights file the extractor runs with seeded random weights
(clearly tagged; fine for plumbing/smoke, NOT for comparable FID numbers).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

FEATURE_DIM = 2048


def _avg_pool_nopad(x: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """3x3 stride-1 average pool, count_include_pad=False (FID detail)."""
    ones = jnp.ones(x.shape[:1] + x.shape[1:3] + (1,), x.dtype)
    sum_ = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), "SAME"
    )
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), "SAME"
    )
    return sum_ / cnt


def _max_pool(x: jnp.ndarray, window: int, stride: int, same: bool = False) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        "SAME" if same else "VALID",
    )


class ConvBN(nn.Module):
    """conv + (folded) BN + relu.  Params: kernel HWIO + bias (BN folded)."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Sequence[Tuple[int, int]] | str = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Conv(
            self.features, self.kernel, strides=self.strides, padding=self.padding,
            use_bias=True, name="conv",
        )(x)
        return nn.relu(y)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=((2, 2), (2, 2)), name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nopad(x)
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        p30 = ((3, 3), (0, 0))
        p03 = ((0, 0), (3, 3))
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=p03, name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=p30, name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=p30, name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=p03, name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=p30, name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=p03, name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nopad(x)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # 'avg' (Mixed_7b) | 'max' (Mixed_7c, FID detail)

    @nn.compact
    def __call__(self, x):
        p1 = ((0, 0), (1, 1))
        p10 = ((1, 1), (0, 0))
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            ConvBN(384, (1, 3), padding=p1, name="branch3x3_2a")(b3),
            ConvBN(384, (3, 1), padding=p10, name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            ConvBN(384, (1, 3), padding=p1, name="branch3x3dbl_3a")(bd),
            ConvBN(384, (3, 1), padding=p10, name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_mode == "max":
            bp = _max_pool(x, 3, 1, same=True)
        else:
            bp = _avg_pool_nopad(x)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """uint8/float images -> 2048-d FID features."""

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        x = images.astype(jnp.float32)
        if images.dtype == jnp.uint8:
            x = x / 127.5 - 1.0
        if x.shape[1] != 299 or x.shape[2] != 299:
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear"
            )
        x = ConvBN(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=((1, 1), (1, 1)), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # (B, 2048)


# ---------------------------------------------------------------------------
# Weight conversion: torchvision/pytorch-fid state dict -> folded Flax params.


def convert_inception(state_dict) -> dict:
    """Map `<block>.conv.weight` + `<block>.bn.{weight,bias,mean,var}` keys to
    folded conv kernel/bias pytrees matching ``InceptionV3Features``."""
    tree: dict = {}
    prefixes = sorted(
        {k[: -len(".conv.weight")] for k in state_dict if k.endswith(".conv.weight")}
    )
    for p in prefixes:
        w = np.asarray(state_dict[f"{p}.conv.weight"], np.float64)  # OIHW
        gamma = np.asarray(state_dict[f"{p}.bn.weight"], np.float64)
        beta = np.asarray(state_dict[f"{p}.bn.bias"], np.float64)
        mean = np.asarray(state_dict[f"{p}.bn.running_mean"], np.float64)
        var = np.asarray(state_dict[f"{p}.bn.running_var"], np.float64)
        scale = gamma / np.sqrt(var + 1e-3)  # torchvision BN eps=0.001
        w_folded = (w * scale[:, None, None, None]).transpose(2, 3, 1, 0)  # HWIO
        b_folded = beta - mean * scale
        node = tree
        for part in p.split("."):
            node = node.setdefault(part, {})
        node["conv"] = {
            "kernel": w_folded.astype(np.float32),
            "bias": b_folded.astype(np.float32),
        }
    return tree


def load_inception_params(weights_path: Optional[str] = None, seed: int = 0) -> dict:
    """Load + convert a torch weights file; seeded random params otherwise."""
    model = InceptionV3Features()
    if weights_path:
        from .convert import load_torch_state_dict

        return convert_inception(load_torch_state_dict(weights_path))
    dummy = jnp.zeros((1, 64, 64, 3), jnp.uint8)
    return model.init(jax.random.PRNGKey(seed), dummy)["params"]
