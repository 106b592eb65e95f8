"""Numerical parity gates: N1/N2 ops vs the reference torch ref impls.

The reference's CUDA plugins are disabled at runtime (custom_ops _init returns
False), so its ground truth IS the python ref path: ``_bias_act_ref``
(torch_utils/ops/bias_act.py:89-92 dispatch, 105-129 impl) and
``_upfirdn2d_ref`` (torch_utils/ops/upfirdn2d.py:172-207).  These gates pin
our jnp implementations (and through the registry, the Pallas kernels'
parity-tested contracts) to those references, including gradient behaviour
for bias_act.  Skips cleanly when the reference checkout is absent.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "torch_utils")), reason="reference checkout absent"
)


@pytest.fixture(scope="module")
def ref_ops():
    sys.path.insert(0, REF)
    try:
        from torch_utils.ops import bias_act as ref_bias_act
        from torch_utils.ops import upfirdn2d as ref_upfirdn2d
    finally:
        sys.path.remove(REF)
    return ref_bias_act, ref_upfirdn2d


ACTS = ["linear", "relu", "lrelu", "tanh", "sigmoid", "elu", "selu", "softplus", "swish"]


@pytest.mark.parametrize("act", ACTS)
def test_bias_act_parity(ref_ops, act):
    import jax.numpy as jnp

    from sid_lsg_tpu import ops

    ref_bias_act, _ = ref_ops
    rng = np.random.RandomState(hash(act) % 2**31)
    x = (rng.randn(2, 8, 5, 5) * 3).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    for gain, clamp in [(None, None), (2.0, None), (1.5, 4.0)]:
        want = ref_bias_act.bias_act(
            torch.as_tensor(x), torch.as_tensor(b), dim=1, act=act,
            gain=gain, clamp=clamp, impl="ref",
        ).numpy()
        got = np.asarray(
            ops.bias_act(jnp.asarray(x), jnp.asarray(b), dim=1, act=act,
                         gain=gain, clamp=clamp)
        )
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5,
                                   err_msg=f"{act} gain={gain} clamp={clamp}")


def test_bias_act_grad_parity(ref_ops):
    """First AND second order gradients match the torch autograd ref."""
    import jax
    import jax.numpy as jnp

    from sid_lsg_tpu import ops

    ref_bias_act, _ = ref_ops
    rng = np.random.RandomState(0)
    x = rng.randn(3, 6).astype(np.float32)
    b = rng.randn(6).astype(np.float32)

    xt = torch.as_tensor(x).requires_grad_(True)
    bt = torch.as_tensor(b).requires_grad_(True)
    y = ref_bias_act.bias_act(xt, bt, dim=1, act="lrelu", gain=1.4, clamp=3.0,
                              impl="ref")
    (gx,) = torch.autograd.grad(y.square().sum(), xt, create_graph=True)
    (ggx,) = torch.autograd.grad(gx.square().sum(), xt)

    f = lambda xx, bb: jnp.sum(
        jnp.square(ops.bias_act(xx, bb, dim=1, act="lrelu", gain=1.4, clamp=3.0))
    )
    jgx = jax.grad(f)(jnp.asarray(x), jnp.asarray(b))
    g2 = lambda xx: jnp.sum(jnp.square(jax.grad(f)(xx, jnp.asarray(b))))
    jggx = jax.grad(g2)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jgx), gx.detach().numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jggx), ggx.numpy(), atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize(
    "up,down,padding,flip",
    [
        (1, 1, 0, False),
        (1, 1, (1, 2, 0, 3), False),
        (2, 1, 1, False),
        (1, 2, 1, False),
        (2, 2, (2, 1, 1, 2), False),
        ((2, 1), (1, 2), 1, True),
    ],
)
def test_upfirdn2d_parity(ref_ops, up, down, padding, flip):
    import jax.numpy as jnp

    from sid_lsg_tpu import ops

    _, ref_upfirdn2d = ref_ops
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 9, 7).astype(np.float32)
    f = ref_upfirdn2d.setup_filter([1, 3, 3, 1])
    want = ref_upfirdn2d.upfirdn2d(
        torch.as_tensor(x), f, up=up, down=down, padding=padding,
        flip_filter=flip, gain=2.0, impl="ref",
    ).numpy()
    got = np.asarray(
        ops.upfirdn2d(
            jnp.asarray(x), jnp.asarray(f.numpy()), up=up, down=down,
            padding=padding, flip_filter=flip, gain=2.0,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("fn", ["filter2d", "upsample2d", "downsample2d"])
def test_upfirdn_wrappers_parity(ref_ops, fn):
    import jax.numpy as jnp

    from sid_lsg_tpu import ops

    _, ref_upfirdn2d = ref_ops
    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    f = ref_upfirdn2d.setup_filter([1, 3, 3, 1])
    want = getattr(ref_upfirdn2d, fn)(torch.as_tensor(x), f, impl="ref").numpy()
    got = np.asarray(getattr(ops, fn)(jnp.asarray(x), jnp.asarray(f.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
