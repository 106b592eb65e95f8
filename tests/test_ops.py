"""Parity tests: op reference impls vs direct numpy/manual realisations,
plus pallas-vs-ref parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sid_lsg_tpu import ops


# ---------------------------------------------------------------------------
# bias_act

@pytest.mark.parametrize("act", ["linear", "relu", "lrelu", "tanh", "sigmoid", "swish"])
def test_bias_act_ref(act):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 4, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    y = ops.bias_act(x, b, dim=1, act=act, impl="ref")
    spec = ops.activation_funcs[act]
    xb = np.asarray(x) + np.asarray(b)[None, :, None, None]
    want = np.asarray(spec.func(jnp.asarray(xb), spec.def_alpha)) * spec.def_gain
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-6)


def test_bias_act_clamp_and_gain():
    x = jnp.asarray(np.linspace(-3, 3, 32, dtype=np.float32).reshape(2, 16))
    y = ops.bias_act(x, None, dim=1, act="linear", gain=2.0, clamp=1.5, impl="ref")
    np.testing.assert_allclose(np.asarray(y), np.clip(np.asarray(x) * 2.0, -1.5, 1.5))


def test_bias_act_grad():
    x = jnp.asarray(np.random.RandomState(1).randn(4, 8).astype(np.float32))
    b = jnp.zeros((8,))
    g = jax.grad(lambda x, b: jnp.sum(ops.bias_act(x, b, dim=1, act="swish", impl="ref")))(x, b)
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------------------
# upfirdn2d


def _upfirdn2d_numpy(x, f, up, down, pad, gain=1.0, flip=False):
    """Direct numpy realisation of the documented semantics."""
    n, c, h, w = x.shape
    ux, uy = (up, up) if isinstance(up, int) else up
    dx, dy = (down, down) if isinstance(down, int) else down
    px0, px1, py0, py1 = pad
    up_arr = np.zeros((n, c, h * uy, w * ux), dtype=np.float64)
    up_arr[:, :, ::uy, ::ux] = x
    padded = np.zeros(
        (n, c, h * uy + max(py0, 0) + max(py1, 0), w * ux + max(px0, 0) + max(px1, 0))
    )
    padded[:, :, max(py0, 0) : max(py0, 0) + h * uy, max(px0, 0) : max(px0, 0) + w * ux] = up_arr
    padded = padded[
        :, :, max(-py0, 0) : padded.shape[2] - max(-py1, 0), max(-px0, 0) : padded.shape[3] - max(-px1, 0)
    ]
    ff = np.asarray(f, dtype=np.float64)
    if ff.ndim == 1:
        ff = np.outer(ff, ff)
        g = gain
    else:
        g = gain
    ff = ff * g
    if not flip:
        ff = ff[::-1, ::-1]
    fh, fw = ff.shape
    oh = padded.shape[2] - fh + 1
    ow = padded.shape[3] - fw + 1
    out = np.zeros((n, c, oh, ow))
    for i in range(fh):
        for j in range(fw):
            out += ff[i, j] * padded[:, :, i : i + oh, j : j + ow]
    return out[:, :, ::dy, ::dx]


@pytest.mark.parametrize(
    "up,down,pad",
    [(1, 1, (1, 1, 1, 1)), (2, 1, (2, 1, 2, 1)), (1, 2, (1, 1, 1, 1)), (2, 2, (2, 2, 2, 2)),
     (1, 1, (-1, -1, -1, -1))],
)
def test_upfirdn2d_vs_numpy(up, down, pad):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    f = rng.rand(4, 4).astype(np.float32)
    got = ops.upfirdn2d(jnp.asarray(x), jnp.asarray(f), up=up, down=down, padding=list(pad))
    want = _upfirdn2d_numpy(x, f, up, down, pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_upfirdn2d_separable_matches_outer():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 2, 8, 8).astype(np.float32))
    f1 = rng.rand(4).astype(np.float32)
    got = ops.upfirdn2d(x, jnp.asarray(f1), up=2, padding=[2, 1, 2, 1])
    want = ops.upfirdn2d(x, jnp.asarray(np.outer(f1, f1)), up=2, padding=[2, 1, 2, 1])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_upsample_downsample_roundtrip_dc():
    """Up then down with a normalized filter preserves a constant signal."""
    f = ops.setup_filter([1, 3, 3, 1])
    x = jnp.ones((1, 1, 8, 8))
    up = ops.upsample2d(x, f)
    assert up.shape == (1, 1, 16, 16)
    # DC gain of upsample2d is up^2 * (1/up^2 per-tap density) = 1 in the interior
    np.testing.assert_allclose(np.asarray(up)[0, 0, 4:12, 4:12], 1.0, rtol=1e-4)
    down = ops.downsample2d(up, f)
    assert down.shape == (1, 1, 8, 8)
    np.testing.assert_allclose(np.asarray(down)[0, 0, 2:6, 2:6], 1.0, rtol=1e-4)


# ---------------------------------------------------------------------------
# group_norm


def test_group_norm_matches_manual():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 4, 8).astype(np.float32)
    gamma = rng.rand(8).astype(np.float32) + 0.5
    beta = rng.randn(8).astype(np.float32)
    y = ops.group_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), num_groups=2, impl="ref")
    xr = x.reshape(2, 16, 2, 4)
    mean = xr.mean(axis=(1, 3), keepdims=True)
    var = ((xr - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    want = ((xr - mean) / np.sqrt(var + 1e-5)).reshape(2, 4, 4, 8) * gamma + beta
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)


def test_group_norm_silu():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 2, 2, 4).astype(np.float32))
    g = jnp.ones((4,))
    b = jnp.zeros((4,))
    y = ops.group_norm_silu(x, g, b, num_groups=2)
    yn = ops.group_norm(x, g, b, num_groups=2)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(yn) / (1 + np.exp(-np.asarray(yn))), rtol=1e-4, atol=1e-5
    )


# ---------------------------------------------------------------------------
# attention


def test_attention_matches_manual():
    rng = np.random.RandomState(0)
    q = rng.randn(2, 2, 16, 8).astype(np.float32)
    k = rng.randn(2, 2, 12, 8).astype(np.float32)
    v = rng.randn(2, 2, 12, 8).astype(np.float32)
    out = ops.attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), impl="ref")
    scale = 8**-0.5
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", p, v)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_attention_causal():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 1, 8, 4).astype(np.float32))
    k, v = q, q
    out = ops.attention(q, k, v, causal=True, impl="ref")
    # Row 0 attends only to position 0 -> output equals v[0].
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], np.asarray(v)[0, 0, 0], rtol=1e-5)


def test_attention_grad():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 2, 8, 4).astype(np.float32))
    g = jax.grad(lambda q: jnp.sum(ops.attention(q, q, q, impl="ref") ** 2))(q)
    assert np.all(np.isfinite(np.asarray(g)))


def test_conv2d_resample_matches_plain_conv():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sid_lsg_tpu.ops import conv2d_resample, setup_filter

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 3, 8, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (5, 3, 3, 3))
    # up=down=1 reduces to a plain conv.
    y = conv2d_resample(x, w, padding=1)
    ref = jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 3, 1, 0)), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
    # up=2 doubles the spatial size.
    f = setup_filter([1, 3, 3, 1])
    y2 = conv2d_resample(x, w, f=f, up=2, padding=1)
    assert y2.shape == (2, 5, 16, 16)
    # down=2 halves it.
    y3 = conv2d_resample(x, w, f=f, down=2, padding=1)
    assert y3.shape == (2, 5, 4, 4)


def test_grid_sample_identity_and_grads():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sid_lsg_tpu.ops import grid_sample

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 6, 6))
    # Identity grid (align_corners=False pixel centers).
    ys = (jnp.arange(6) + 0.5) / 6 * 2 - 1
    gy, gx = jnp.meshgrid(ys, ys, indexing="ij")
    grid = jnp.stack([gx, gy], axis=-1)[None]
    out = grid_sample(x, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)
    # 2nd-order grads exist (the reference gradfix capability).
    loss = lambda g: jnp.sum(grid_sample(x, g) ** 2)
    hvp = jax.grad(lambda g: jnp.sum(jax.grad(loss)(g) ** 2))(grid)
    assert np.all(np.isfinite(np.asarray(hvp)))


def test_fma():
    import jax.numpy as jnp
    import numpy as np

    from sid_lsg_tpu.ops import fma

    a, b, c = jnp.ones((2, 2)) * 2, jnp.ones((2, 2)) * 3, jnp.ones((2, 2))
    np.testing.assert_allclose(np.asarray(fma(a, b, c)), 7.0)


def test_registry_vetoes_unaware_pallas_under_shard_mesh():
    """Under a registered >1-device mesh only attention shard_map-routes its
    Mosaic kernel; every other op must resolve to 'ref' or GSPMD dies with
    'Mosaic kernels cannot be automatically partitioned' (found by the
    --adv-tower dino pod-topology AOT compile)."""
    import jax

    import importlib

    attn_mod = importlib.import_module("sid_lsg_tpu.ops.attention")
    ba = importlib.import_module("sid_lsg_tpu.ops.bias_act")
    from sid_lsg_tpu.ops import registry
    from sid_lsg_tpu.parallel import make_mesh

    mesh = make_mesh(dp=4, fsdp=2)
    with attn_mod.shard_mesh_scope(mesh):
        assert registry.impl_for("bias_act", "pallas") is ba._bias_act_ref
        assert registry.impl_for("bias_act", "auto") is ba._bias_act_ref
        assert (registry.impl_for("attention", "pallas")
                is attn_mod._attention_pallas)
    # Cleared scope: pallas resolves again (explicit request).
    assert registry.impl_for("bias_act", "pallas") is ba._bias_act_pallas
