"""Fused bias + activation (+gain, +clamp).

Capability parity with reference ``torch_utils/ops/bias_act.py`` (act table at
lines 23-33, CUDA kernel ops/bias_act.cu) — N1 in SURVEY.md §2.2.  On TPU the
elementwise chain fuses into the producing matmul under XLA anyway, so the
``'ref'`` impl is the production path; the ``'pallas'`` impl exists for
explicit fusion control and as the parity-tested kernel exemplar (single VMEM
pass, VPU ops only).  Gradients: jnp autodiff for 'ref'; the pallas path wraps
a ``custom_vjp`` that recomputes with the jnp formula (arbitrary-order grads
preserved, unlike the reference's hand-written grad kernels).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .registry import impl_for, register_op


@dataclasses.dataclass(frozen=True)
class _Act:
    func: Callable[[jnp.ndarray, float], jnp.ndarray]
    def_alpha: float
    def_gain: float


activation_funcs = {
    "linear": _Act(lambda x, a: x, 0.0, 1.0),
    "relu": _Act(lambda x, a: jnp.maximum(x, 0.0), 0.0, float(np.sqrt(2))),
    "lrelu": _Act(lambda x, a: jnp.where(x >= 0, x, x * a), 0.2, float(np.sqrt(2))),
    "tanh": _Act(lambda x, a: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": _Act(lambda x, a: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": _Act(lambda x, a: jax.nn.elu(x), 0.0, 1.0),
    "selu": _Act(lambda x, a: jax.nn.selu(x), 0.0, 1.0),
    "softplus": _Act(lambda x, a: jax.nn.softplus(x), 0.0, 1.0),
    "swish": _Act(lambda x, a: jax.nn.silu(x), 0.0, float(np.sqrt(2))),
}


def _resolve(act: str, alpha: Optional[float], gain: Optional[float], clamp: Optional[float]):
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)
    clamp = float(clamp if clamp is not None else -1.0)
    return spec, alpha, gain, clamp


def _bias_act_ref(x, b, dim, act, alpha, gain, clamp):
    spec, alpha, gain, clamp = _resolve(act, alpha, gain, clamp)
    if b is not None:
        assert b.ndim == 1 and b.shape[0] == x.shape[dim]
        x = x + b.reshape([-1 if i == dim else 1 for i in range(x.ndim)])
    x = spec.func(x, alpha)
    if gain != 1.0:
        x = x * gain
    if clamp >= 0.0:
        x = jnp.clip(x, -clamp, clamp)
    return x


register_op("bias_act", "ref", _bias_act_ref)


# ---------------------------------------------------------------------------
# Pallas implementation: one VMEM-resident elementwise pass.

def _pallas_eligible(x: jnp.ndarray) -> bool:
    # Needs a 2D-reshapeable, reasonably sized block; stay well under VMEM.
    return x.ndim >= 2 and x.size * x.dtype.itemsize <= 8 * 1024 * 1024


def _bias_act_pallas_fwd(x2, b_row, act, alpha, gain, clamp):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec, alpha, gain, clamp = _resolve(act, alpha, gain, clamp)

    def kernel(x_ref, b_ref, o_ref):
        v = x_ref[:] + b_ref[:]
        v = spec.func(v, alpha)
        if gain != 1.0:
            v = v * gain
        if clamp >= 0.0:
            v = jnp.clip(v, -clamp, clamp)
        o_ref[:] = v

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x2, b_row)


def _bias_act_pallas(x, b, dim, act, alpha, gain, clamp):
    if not _pallas_eligible(x):
        return _bias_act_ref(x, b, dim, act, alpha, gain, clamp)

    # Canonicalise to (rows, channels) with the bias on the last axis.
    perm = [i for i in range(x.ndim) if i != dim] + [dim]
    xt = jnp.transpose(x, perm)
    lead_shape = xt.shape[:-1]
    c = xt.shape[-1]
    x2 = xt.reshape(-1, c)
    b_row = jnp.zeros((1, c), x.dtype) if b is None else b.reshape(1, c).astype(x.dtype)
    b2 = jnp.broadcast_to(b_row, x2.shape)

    def _ref2(xx, bb):
        spec, a, gn, cl = _resolve(act, alpha, gain, clamp)
        v = spec.func(xx + bb, a)
        if gn != 1.0:
            v = v * gn
        if cl >= 0.0:
            v = jnp.clip(v, -cl, cl)
        return v

    @jax.custom_vjp
    def _op(x2, b2):
        return _bias_act_pallas_fwd(x2, b2, act, alpha, gain, clamp)

    def _fwd(x2, b2):
        return _op(x2, b2), (x2, b2)

    def _bwd(res, g):
        x2, b2 = res
        _, vjp = jax.vjp(_ref2, x2, b2)
        return vjp(g)

    _op.defvjp(_fwd, _bwd)
    y2 = _op(x2, b2)
    yt = y2.reshape(lead_shape + (c,))
    inv = np.argsort(perm)
    return jnp.transpose(yt, inv)


register_op("bias_act", "pallas", _bias_act_pallas)


def bias_act(
    x: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    dim: int = 1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """y = clamp(gain * act(x + b)) with b broadcast along ``dim``."""
    fn = impl_for("bias_act", impl, pallas_ok=_pallas_eligible(x))
    return fn(x, b, dim, act, alpha, gain, clamp)
