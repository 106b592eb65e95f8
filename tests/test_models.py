"""Model zoo shape/grad tests on tiny configs, plus CLIP parity vs torch
transformers (the strongest numerical gate available offline, SURVEY.md §7
hard part #1).

All applies are jitted once per fixture and reused with constant shapes —
eager jax on the 1-core CI box is orders of magnitude slower.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sid_lsg_tpu.models import (
    TINY,
    AutoencoderKL,
    CLIPTextConfig,
    CLIPTextModel,
    UNet2DCondition,
)

CTX_DIM = TINY.unet.cross_attention_dim


@pytest.fixture(scope="module")
def unet_setup():
    model = UNet2DCondition(TINY.unet)
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.array([100, 600])
    ctx = jnp.zeros((2, 7, CTX_DIM))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, ctx)
    apply = jax.jit(model.apply)
    return model, params, apply


def test_unet_forward(unet_setup):
    """Shapes, finiteness, timestep- and context-sensitivity in one pass."""
    _, params, apply = unet_setup
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    x = jnp.concatenate([x[:1], x[:1]], axis=0)  # identical inputs...
    ctx = jnp.zeros((2, 7, CTX_DIM))
    out = apply(params, x, jnp.array([10, 900]), ctx)  # ...different timesteps
    assert out.shape == (2, 8, 8, 4)
    assert np.all(np.isfinite(np.asarray(out)))
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))

    ctx2 = jnp.concatenate([jnp.zeros((1, 7, CTX_DIM)), jnp.ones((1, 7, CTX_DIM))])
    out2 = apply(params, x, jnp.array([500, 500]), ctx2)  # different contexts
    assert not np.allclose(np.asarray(out2[0]), np.asarray(out2[1]))


def test_unet_grad_finite(unet_setup):
    model, params, _ = unet_setup
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 4))
    t = jnp.array([300, 300])
    ctx = jnp.ones((2, 7, CTX_DIM))

    g = jax.jit(jax.grad(lambda p: jnp.mean(model.apply(p, x, t, ctx) ** 2)))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


def test_vae_roundtrip_shapes():
    model = AutoencoderKL(TINY.vae)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    lat = jax.jit(lambda p, x: model.apply(p, x, method=model.encode))(params, x)
    assert lat.shape == (1, 8, 8, 4)  # one downsample level in tiny config
    img = jax.jit(lambda p, z: model.apply(p, z, method=model.decode))(params, lat)
    assert img.shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(img)))


def test_clip_parity_vs_transformers():
    """Random-weight parity: build torch CLIPTextModel with a tiny config,
    port its weights, compare last_hidden_state."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    from sid_lsg_tpu.models.convert import convert_clip_text

    hf_cfg = HFConfig(
        vocab_size=99,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=77,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf_model = HFModel(hf_cfg).eval()
    ids = torch.randint(0, 99, (2, 77))
    with torch.no_grad():
        want = hf_model(ids).last_hidden_state.numpy()

    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, hidden_act="quick_gelu",
    )
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = {"params": convert_clip_text(sd, cfg)}
    model = CLIPTextModel(cfg)
    got = jax.jit(model.apply)(params, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
