"""EDM legacy net tests: shapes, variants, preconditioner math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sid_lsg_tpu.models.edm_networks import (
    DhariwalUNet,
    EDMPrecond,
    FourierEmbedding,
    PositionalEmbedding,
    SongUNet,
    VEPrecond,
    VPPrecond,
    iDDPMPrecond,
)


def _init_and_run(model, res, in_ch, label_dim=0):
    x = jnp.ones((2, res, res, in_ch))
    t = jnp.asarray([0.3, 0.7])
    labels = jnp.eye(label_dim)[:2] if label_dim else None
    params = model.init(jax.random.PRNGKey(0), x, t, labels)["params"]
    out = model.apply({"params": params}, x, t, labels)
    return params, out


@pytest.mark.parametrize(
    "emb,enc,dec",
    [("positional", "standard", "standard"), ("fourier", "residual", "skip"),
     ("positional", "skip", "skip")],
)
def test_song_unet_variants(emb, enc, dec):
    model = SongUNet(
        img_resolution=16, in_channels=3, out_channels=3, model_channels=16,
        channel_mult=(1, 2), num_blocks=1, attn_resolutions=(8,),
        embedding_type=emb, encoder_type=enc, decoder_type=dec,
        resample_filter=(1, 1) if emb == "positional" else (1, 3, 3, 1),
    )
    _, out = _init_and_run(model, 16, 3)
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dhariwal_unet_with_labels():
    model = DhariwalUNet(
        img_resolution=16, in_channels=3, out_channels=3, model_channels=16,
        channel_mult=(1, 2), num_blocks=1, attn_resolutions=(8,), label_dim=4,
    )
    _, out = _init_and_run(model, 16, 3, label_dim=4)
    assert out.shape == (2, 16, 16, 3)


def _tiny_song():
    model = SongUNet(
        img_resolution=8, in_channels=3, out_channels=3, model_channels=8,
        channel_mult=(1,), num_blocks=1, attn_resolutions=(),
    )
    x = jnp.zeros((1, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))["params"]
    return model, params


@pytest.mark.parametrize("cls", [VPPrecond, VEPrecond, iDDPMPrecond, EDMPrecond])
def test_preconds_run(cls):
    model, params = _tiny_song()
    precond = cls(model, params)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    sigma = jnp.asarray([0.5, 2.0])
    d = precond(x, sigma)
    assert d.shape == x.shape and np.all(np.isfinite(np.asarray(d)))


def test_precond_coefficients():
    model, params = _tiny_song()
    # EDM: at sigma == sigma_data, c_skip must be 0.5.
    p = EDMPrecond(model, params, sigma_data=0.5)
    sd2 = 0.5**2
    sigma = 0.5
    assert np.isclose(sd2 / (sigma**2 + sd2), 0.5)
    # VP: sigma(t) and its inverse are consistent.
    vp = VPPrecond(model, params)
    t = jnp.asarray([0.2, 0.9])
    np.testing.assert_allclose(np.asarray(vp.sigma_inv(vp.sigma(t))), np.asarray(t), rtol=1e-5)
    # iDDPM: round_sigma snaps to table entries.
    idp = iDDPMPrecond(model, params)
    snapped = idp.round_sigma(jnp.asarray([0.5]))
    assert np.any(np.isclose(np.asarray(idp.u), np.asarray(snapped)[0]))


def test_embeddings():
    pe = PositionalEmbedding(8)(jnp.asarray([1.0, 2.0]))
    assert pe.shape == (2, 8)
    fe_model = FourierEmbedding(8)
    params = fe_model.init(jax.random.PRNGKey(0), jnp.asarray([1.0]))
    fe = fe_model.apply(params, jnp.asarray([1.0, 2.0]))
    assert fe.shape == (2, 8)
