"""GroupNorm (+ fused SiLU) for NHWC activations.

The UNet/VAE hot elementwise path: every ResNet block runs
GroupNorm -> SiLU -> conv (reference uses torch GroupNorm inside diffusers
blocks; the fused-elementwise role mirrors N1 bias_act, SURVEY.md §2.2).

'ref' impl: pure jnp — XLA fuses the normalise+scale+silu chain into
neighbouring ops.  'pallas' impl: one VMEM pass per batch element that
computes group statistics via VPU reductions plus a tiny (C,G) indicator
matmul (MXU), then normalises and applies SiLU in-register — no HBM round
trip between stats and apply.  Gradients for the pallas path recompute with
the jnp formula under ``custom_vjp``.

Stats are always accumulated in float32 regardless of activation dtype
(replaces the reference's fp16 NaN hygiene for normalisation layers).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .registry import impl_for, register_op


def _group_norm_ref(x, gamma, beta, num_groups, eps, silu):
    b, h, w, c = x.shape
    cg = c // num_groups
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, cg)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = jnp.square(xf - mean).mean(axis=(1, 3), keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(b, h, w, c)
    y = xn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


register_op("group_norm", "ref", _group_norm_ref)


def _pallas_eligible(x: jnp.ndarray) -> bool:
    if x.ndim != 4:
        return False
    b, h, w, c = x.shape
    # One (HW, C) f32 block per program must fit comfortably in VMEM.
    return (h * w) * c * 4 <= 6 * 1024 * 1024 and c % 128 == 0


def _gn_silu_pallas_fwd(x, gamma, beta, num_groups, eps, silu):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    hw = h * w
    cg = c // num_groups
    x2 = x.reshape(b, hw, c)

    def kernel(x_ref, g_ref, b_ref, o_ref):
        xv = x_ref[0].astype(jnp.float32)  # (HW, C)
        # Per-channel sums (VPU reduce), then per-group via indicator matmul.
        ch_sum = jnp.sum(xv, axis=0, keepdims=True)  # (1, C)
        ch_sqsum = jnp.sum(xv * xv, axis=0, keepdims=True)
        group_of_c = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cg
        gid = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
        m = (group_of_c == gid).astype(jnp.float32)  # (C, G) indicator
        g_sum = jnp.dot(ch_sum, m, preferred_element_type=jnp.float32)  # (1, G)
        g_sqsum = jnp.dot(ch_sqsum, m, preferred_element_type=jnp.float32)
        n = jnp.float32(hw * cg)
        g_mean = g_sum / n
        g_var = g_sqsum / n - g_mean * g_mean
        g_rstd = jax.lax.rsqrt(g_var + eps)
        # Scatter group stats back to channels: (1,G) @ (G,C).
        mean_c = jnp.dot(g_mean, m.T, preferred_element_type=jnp.float32)
        rstd_c = jnp.dot(g_rstd, m.T, preferred_element_type=jnp.float32)
        y = (xv - mean_c) * rstd_c * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
        if silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0] = y.astype(o_ref.dtype)

    y2 = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
    )(x2, gamma.reshape(1, c), beta.reshape(1, c))
    return y2.reshape(b, h, w, c)


def _gn_silu_pallas(x, gamma, beta, num_groups, eps, silu):
    if not _pallas_eligible(x):
        return _group_norm_ref(x, gamma, beta, num_groups, eps, silu)

    @jax.custom_vjp
    def _op(x, gamma, beta):
        return _gn_silu_pallas_fwd(x, gamma, beta, num_groups, eps, silu)

    def _fwd(x, gamma, beta):
        return _op(x, gamma, beta), (x, gamma, beta)

    def _bwd(res, g):
        x, gamma, beta = res
        _, vjp = jax.vjp(partial(_group_norm_ref, num_groups=num_groups, eps=eps, silu=silu),
                         x, gamma, beta)
        return vjp(g)

    _op.defvjp(_fwd, _bwd)
    return _op(x, gamma, beta)


register_op("group_norm", "pallas", _gn_silu_pallas)


def group_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
    silu: bool = False,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """GroupNorm over NHWC with optional fused SiLU."""
    assert x.shape[-1] % num_groups == 0
    fn = impl_for("group_norm", impl, pallas_ok=_pallas_eligible(x))
    return fn(x, gamma, beta, num_groups, eps, silu)


def group_norm_silu(x, gamma, beta, num_groups=32, eps=1e-5, impl=None):
    return group_norm(x, gamma, beta, num_groups, eps, silu=True, impl=impl)
