"""Numerical parity gates: EDM legacy nets vs the reference torch modules.

The reference's ``training/networks.py`` (SongUNet:229, DhariwalUNet:372,
preconditioners:469-673) runs on CPU with no external deps, so every legacy
net gets a convert-and-compare gate here: build the torch module, randomise
its weights, convert the state dict with ``models.convert.convert_edm_unet``,
and require allclose between the torch forward (NCHW) and the Flax forward
(NHWC).  Skips cleanly when the reference checkout is absent.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "training")), reason="reference checkout absent"
)


@pytest.fixture(scope="module")
def ref_networks():
    sys.path.insert(0, REF)
    try:
        from training import networks
    finally:
        sys.path.remove(REF)
    return networks


def _randomise(module: "torch.nn.Module", seed: int) -> None:
    """Well-scaled random weights everywhere (the EDM init_zero convs would
    otherwise make outputs degenerate ~0)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)


def _compare_unet(ref_net, flax_net, *, label_dim=0, augment_dim=0, res=16,
                  in_channels=3, seed=0, atol=2e-4, rtol=2e-3):
    import jax.numpy as jnp

    from sid_lsg_tpu.models.convert import convert_edm_unet

    ref_net = ref_net.eval()
    _randomise(ref_net, seed + 100)
    params = convert_edm_unet(
        {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
    )
    rng = np.random.RandomState(seed)
    x = rng.randn(2, in_channels, res, res).astype(np.float32)
    noise = rng.randn(2).astype(np.float32)
    labels = (
        rng.randn(2, label_dim).astype(np.float32) if label_dim else None
    )
    aug = rng.randn(2, augment_dim).astype(np.float32) if augment_dim else None
    with torch.no_grad():
        want = ref_net(
            torch.as_tensor(x), torch.as_tensor(noise),
            torch.as_tensor(labels) if labels is not None else None,
            augment_labels=torch.as_tensor(aug) if aug is not None else None,
        ).numpy()
    got = flax_net.apply(
        {"params": params},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(noise),
        jnp.asarray(labels) if labels is not None else None,
        jnp.asarray(aug) if aug is not None else None,
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)


def test_songunet_ddpmpp_parity(ref_networks):
    """DDPM++ config: positional emb, standard enc/dec, [1,1] filter.
    Ref: training/networks.py:229-361."""
    from sid_lsg_tpu.models.edm_networks import SongUNet

    kw = dict(
        img_resolution=16, in_channels=3, out_channels=3, model_channels=16,
        channel_mult=[1, 2], num_blocks=1, attn_resolutions=[8],
        embedding_type="positional", encoder_type="standard",
        decoder_type="standard", resample_filter=[1, 1], channel_mult_noise=1,
    )
    ref = ref_networks.SongUNet(**kw)
    mine = SongUNet(
        **{**kw, "channel_mult": (1, 2), "attn_resolutions": (8,),
           "resample_filter": (1, 1)}
    )
    _compare_unet(ref, mine, seed=0)


def test_songunet_ncsnpp_parity(ref_networks):
    """NCSN++ config: fourier emb, residual encoder, skip decoder,
    [1,3,3,1] filter, conditional + augment labels."""
    from sid_lsg_tpu.models.edm_networks import SongUNet

    kw = dict(
        img_resolution=16, in_channels=3, out_channels=3, model_channels=16,
        channel_mult=[1, 2], num_blocks=1, attn_resolutions=[8],
        embedding_type="fourier", encoder_type="residual",
        decoder_type="skip", resample_filter=[1, 3, 3, 1],
        channel_mult_noise=2, label_dim=4, augment_dim=3,
    )
    ref = ref_networks.SongUNet(**kw)
    mine = SongUNet(
        **{**kw, "channel_mult": (1, 2), "attn_resolutions": (8,),
           "resample_filter": (1, 3, 3, 1)}
    )
    _compare_unet(ref, mine, label_dim=4, augment_dim=3, seed=1)


def test_songunet_skip_encoder_parity(ref_networks):
    """'skip' encoder variant (aux_down + aux_skip path)."""
    from sid_lsg_tpu.models.edm_networks import SongUNet

    kw = dict(
        img_resolution=16, in_channels=3, out_channels=3, model_channels=16,
        channel_mult=[1, 2], num_blocks=1, attn_resolutions=[],
        embedding_type="positional", encoder_type="skip",
        decoder_type="skip", resample_filter=[1, 1], channel_mult_noise=1,
    )
    ref = ref_networks.SongUNet(**kw)
    mine = SongUNet(
        **{**kw, "channel_mult": (1, 2), "attn_resolutions": (),
           "resample_filter": (1, 1)}
    )
    _compare_unet(ref, mine, seed=2)


def test_dhariwal_unet_parity(ref_networks):
    """ADM config with adaptive scale, class labels, 64-ch attention heads.
    Ref: training/networks.py:372-467."""
    from sid_lsg_tpu.models.edm_networks import DhariwalUNet

    kw = dict(
        img_resolution=16, in_channels=3, out_channels=3, model_channels=32,
        channel_mult=[1, 2], num_blocks=1, attn_resolutions=[8], label_dim=3,
    )
    ref = ref_networks.DhariwalUNet(**kw)
    mine = DhariwalUNet(**{**kw, "channel_mult": (1, 2), "attn_resolutions": (8,)})
    _compare_unet(ref, mine, label_dim=3, seed=3)


@pytest.mark.parametrize("kind", ["vp", "ve", "edm", "iddpm"])
def test_precond_parity(ref_networks, kind):
    """All four sigma-preconditioners, D(x; sigma) end-to-end.
    Ref: training/networks.py:469-673."""
    import jax.numpy as jnp

    from sid_lsg_tpu.models import edm_networks as edm
    from sid_lsg_tpu.models.convert import convert_edm_unet

    model_kw = dict(
        model_channels=16, channel_mult=[1, 2], num_blocks=1,
        attn_resolutions=[8], embedding_type="positional",
        encoder_type="standard", decoder_type="standard",
        resample_filter=[1, 1], channel_mult_noise=1,
    )
    ref_cls = {
        "vp": ref_networks.VPPrecond, "ve": ref_networks.VEPrecond,
        "edm": ref_networks.EDMPrecond, "iddpm": ref_networks.iDDPMPrecond,
    }[kind]
    ref = ref_cls(
        img_resolution=16, img_channels=3, model_type="SongUNet", **model_kw
    ).eval()
    _randomise(ref, 40)

    out_channels = 6 if kind == "iddpm" else 3  # iDDPM nets emit mean+var
    unet = edm.SongUNet(
        img_resolution=16, in_channels=3, out_channels=out_channels,
        **{**model_kw, "channel_mult": (1, 2), "attn_resolutions": (8,),
           "resample_filter": (1, 1)},
    )
    params = convert_edm_unet(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )
    mine = edm.PRECONDS[kind](unet, params)

    rng = np.random.RandomState(5)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    for sigma in (0.1, 1.0, 7.5):
        sig = np.full((2,), sigma, np.float32)
        with torch.no_grad():
            want = ref(torch.as_tensor(x), torch.as_tensor(sig)).numpy()
        got = mine(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(sig))
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=2e-3)
    assert float(mine.sigma_min) == pytest.approx(float(ref.sigma_min), rel=1e-5)
    assert float(mine.sigma_max) == pytest.approx(float(ref.sigma_max), rel=1e-5)
