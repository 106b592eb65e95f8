"""Numerical parity gates: StyleGAN-T layers vs the reference torch modules.

Covers ``networks/generator.py:39-97`` (modulated_conv2d) plus the layer
stack built on it (StyleSplit, SynthesisInput, SynthesisLayer ± residual,
ToRGBLayer) and ``networks/shared.py`` (FullyConnectedLayer/MLP lr-multiplier
semantics).  The reference generator module needs torchvision/open_clip/timm
only for its CLIP text tower, which these gates never touch — those imports
are stubbed.  Skips cleanly when the reference checkout is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "networks")), reason="reference checkout absent"
)


@pytest.fixture(scope="module")
def ref_generator():
    # Stub the CLIP-only deps so networks.generator imports offline.
    for name, attrs in {
        "torchvision": {},
        "torchvision.transforms": {"Normalize": object},
        "open_clip": {"create_model": lambda *a, **k: None},
        "timm": {},
        "timm.data": {"OPENAI_CLIP_MEAN": (0.5,) * 3, "OPENAI_CLIP_STD": (0.5,) * 3},
    }.items():
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    sys.path.insert(0, REF)
    try:
        from networks import generator, shared
    finally:
        sys.path.remove(REF)
    return generator, shared


def _t(x):
    return torch.as_tensor(np.asarray(x))


def test_modulated_conv2d_parity(ref_generator):
    """Function-level gate, both reference execution paths (fused grouped
    conv and unfused activation scaling) at up=1 and up=2."""
    import jax.numpy as jnp

    from sid_lsg_tpu import ops
    from sid_lsg_tpu.models.stylegan_t import modulated_conv2d

    generator, _ = ref_generator
    rng = np.random.RandomState(0)
    b, ci, co, k, r = 2, 8, 12, 3, 8
    x = rng.randn(b, ci, r, r).astype(np.float32)
    w = (rng.randn(co, ci, k, k) * 0.2).astype(np.float32)
    s = (rng.randn(b, ci) * 0.5 + 1.0).astype(np.float32)
    noise = (rng.randn(b, 1, r, r) * 0.1).astype(np.float32)
    f_np = [1, 3, 3, 1]

    for up, demod, use_noise in [(1, True, True), (1, False, False), (2, True, False)]:
        nz = noise if (use_noise and up == 1) else None
        ref_f = generator.upfirdn2d.setup_filter(f_np) if up > 1 else None
        want_fused = generator.modulated_conv2d(
            _t(x), _t(w), _t(s), noise=_t(nz) if nz is not None else None,
            up=up, padding=k // 2 if up == 1 else 1, resample_filter=ref_f,
            demodulate=demod, flip_weight=(up == 1), fused_modconv=True,
        ).numpy()
        want_unfused = generator.modulated_conv2d(
            _t(x), _t(w), _t(s), noise=_t(nz) if nz is not None else None,
            up=up, padding=k // 2 if up == 1 else 1, resample_filter=ref_f,
            demodulate=demod, flip_weight=(up == 1), fused_modconv=False,
        ).numpy()
        got = np.asarray(
            modulated_conv2d(
                jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
                noise=jnp.asarray(nz) if nz is not None else None,
                up=up, padding=k // 2,
                resample_filter=ops.setup_filter(f_np) if up > 1 else None,
                demodulate=demod,
            )
        )
        np.testing.assert_allclose(want_fused, want_unfused, atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(
            got, want_fused, atol=2e-4, rtol=1e-3,
            err_msg=f"up={up} demod={demod} noise={use_noise}",
        )


def test_fully_connected_and_mlp_parity(ref_generator):
    """lr-multiplier runtime scaling semantics (shared.py:29-97)."""
    import jax.numpy as jnp

    from sid_lsg_tpu.models.stylegan_shared import MLP

    _, shared = ref_generator
    torch.manual_seed(0)
    ref = shared.MLP([8, 16, 4], activation="lrelu", lr_multiplier=0.01,
                     linear_out=True).eval()
    params = {}
    for i in range(2):
        fc = getattr(ref, f"fc{i}")
        params[f"fc{i}"] = {
            "weight": fc.weight.detach().numpy(),
            "bias": fc.bias.detach().numpy(),
        }
    x = np.random.RandomState(1).randn(5, 8).astype(np.float32)
    with torch.no_grad():
        want = ref(_t(x)).numpy()
    got = np.asarray(
        MLP([8, 16, 4], activation="lrelu", lr_multiplier=0.01, linear_out=True).apply(
            {"params": params}, jnp.asarray(x)
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def _conv_layer_params(ref_layer, residual=False, use_noise=True):
    p = {
        "weight": ref_layer.weight.detach().numpy(),
        "bias": ref_layer.bias.detach().numpy(),
        "affine": {"proj": {
            "weight": ref_layer.affine.proj.weight.detach().numpy(),
            "bias": ref_layer.affine.proj.bias.detach().numpy(),
        }},
    }
    if use_noise:
        p["noise_strength"] = ref_layer.noise_strength.detach().numpy()
        p["noise_const"] = ref_layer.noise_const.detach().numpy()
    if residual:
        p["gn_scale"] = ref_layer.norm.weight.detach().numpy()
        p["gn_bias"] = ref_layer.norm.bias.detach().numpy()
        p["gamma"] = ref_layer.gamma.detach().numpy()
    return p


@pytest.mark.parametrize("mode", ["plain", "up", "residual"])
def test_synthesis_layer_parity(ref_generator, mode):
    """SynthesisLayer forward: modconv + noise + bias_act gain/clamp chain
    (generator.py:199-293), const-noise path for determinism."""
    import jax.numpy as jnp

    from sid_lsg_tpu.models.stylegan_t import SynthesisLayer

    generator, _ = ref_generator
    torch.manual_seed(2)
    ci = co = 64
    up = 2 if mode == "up" else 1
    res = 16 if mode == "up" else 8
    ref = generator.SynthesisLayer(
        ci, co, w_dim=32, resolution=res, up=up, conv_clamp=256,
        residual=(mode == "residual"),
    ).eval()
    with torch.no_grad():
        ref.noise_strength.copy_(torch.tensor(0.3))
    params = _conv_layer_params(ref, residual=(mode == "residual"))
    rng = np.random.RandomState(3)
    x = rng.randn(2, ci, res // up, res // up).astype(np.float32)
    w = rng.randn(2, 32).astype(np.float32)
    with torch.no_grad():
        want = ref(_t(x), _t(w), noise_mode="const", gain=0.7).numpy()
    mine = SynthesisLayer(
        out_channels=co, w_dim=32, resolution=res, up=up, conv_clamp=256.0,
        residual=(mode == "residual"),
    )
    got = np.asarray(
        mine.apply({"params": params}, jnp.asarray(x), jnp.asarray(w), gain=0.7)
    )
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=2e-3)


def test_torgb_layer_parity(ref_generator):
    import jax.numpy as jnp

    from sid_lsg_tpu.models.stylegan_t import ToRGBLayer

    generator, _ = ref_generator
    torch.manual_seed(4)
    ref = generator.ToRGBLayer(32, 3, w_dim=16, conv_clamp=256).eval()
    params = {
        "weight": ref.weight.detach().numpy(),
        "bias": ref.bias.detach().numpy(),
        "affine": {"proj": {
            "weight": ref.affine.proj.weight.detach().numpy(),
            "bias": ref.affine.proj.bias.detach().numpy(),
        }},
    }
    rng = np.random.RandomState(5)
    x = rng.randn(2, 32, 8, 8).astype(np.float32)
    w = rng.randn(2, 16).astype(np.float32)
    with torch.no_grad():
        want = ref(_t(x), _t(w)).numpy()
    got = np.asarray(
        ToRGBLayer(3, conv_clamp=256.0).apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(w)
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_synthesis_input_parity(ref_generator):
    """Fourier-feature input grid incl. the learned affine transform
    (generator.py:115-196)."""
    import jax.numpy as jnp

    from sid_lsg_tpu.models.stylegan_t import SynthesisInput

    generator, _ = ref_generator
    torch.manual_seed(6)
    ref = generator.SynthesisInput(
        w_dim=16, channels=32, size=8, sampling_rate=8, bandwidth=2
    ).eval()
    with torch.no_grad():
        # Non-trivial learned transform.
        ref.affine.weight.copy_(torch.randn_like(ref.affine.weight) * 0.1)
        ref.affine.bias.copy_(torch.tensor([1.0, 0.3, 0.2, -0.1]))
    params = {
        "weight": ref.weight.detach().numpy(),
        "freqs": ref.freqs.numpy(),
        "phases": ref.phases.numpy(),
        "affine": {
            "weight": ref.affine.weight.detach().numpy(),
            "bias": ref.affine.bias.detach().numpy(),
        },
    }
    w = np.random.RandomState(7).randn(2, 16).astype(np.float32)
    with torch.no_grad():
        want = ref(_t(w)).numpy()
    got = np.asarray(
        SynthesisInput(
            w_dim=16, channels=32, size=8, sampling_rate=8, bandwidth=2.0
        ).apply({"params": params}, jnp.asarray(w))
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
