"""Converter round-trips: flax -> HF state dict -> flax is the identity.

This exercises every mapping entry in both directions (the strongest
structural gate available without downloadable HF weights) and validates the
export path that writes distilled generators in HF layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sid_lsg_tpu import models
from sid_lsg_tpu.models.convert import (
    convert_clip_text,
    convert_unet,
    convert_vae,
    export_clip_text,
    export_unet,
    export_vae,
)


def tree_equal(a, b, path=""):
    assert isinstance(a, dict) == isinstance(b, dict), path
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), err_msg=path)


def test_unet_roundtrip():
    cfg = models.TINY.unet
    unet = models.UNet2DCondition(cfg)
    params = unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.sample_size, cfg.sample_size, cfg.in_channels)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 8, cfg.cross_attention_dim)),
    )["params"]
    sd = export_unet(params, cfg)
    assert all(isinstance(k, str) and "." in k for k in sd)
    back = convert_unet(sd, cfg)
    tree_equal(back, jax.tree_util.tree_map(np.asarray, params))


def test_unet_roundtrip_sd21_style():
    """linear-projection transformer variant (SD2.x layout)."""
    from sid_lsg_tpu.models.configs import UNetConfig

    cfg = UNetConfig(
        sample_size=8, block_out_channels=(32, 64), layers_per_block=1,
        cross_attention_levels=(True, False), num_attention_heads=(2, 2),
        cross_attention_dim=32, norm_num_groups=8, use_linear_projection=True,
    )
    unet = models.UNet2DCondition(cfg)
    params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 8, 32)),
    )["params"]
    tree_equal(convert_unet(export_unet(params, cfg), cfg),
               jax.tree_util.tree_map(np.asarray, params))


def test_vae_roundtrip():
    cfg = models.TINY.vae
    vae = models.AutoencoderKL(cfg)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    tree_equal(convert_vae(export_vae(params, cfg), cfg),
               jax.tree_util.tree_map(np.asarray, params))


def test_clip_text_roundtrip():
    cfg = models.TINY.text
    model = models.CLIPTextModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.max_position_embeddings), jnp.int32)
    )["params"]
    tree_equal(convert_clip_text(export_clip_text(params, cfg), cfg),
               jax.tree_util.tree_map(np.asarray, params))
