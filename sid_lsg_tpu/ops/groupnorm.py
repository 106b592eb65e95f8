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
    xf = x.astype(jnp.float32).reshape(b, h * w, c)
    # Statistics are computed per-CHANNEL first (reduce over hw only), then
    # combined channel->group on the tiny (b, c) tensor.  The direct
    # formulation — reshape to (b, hw, g, cg) and reduce axes (1, 3) — makes
    # the activation-sized reduction's minor dim the cg-channel sub-group
    # (cg=10/20/40 for SD's c=320/640/1280 at 32 groups): a lane-strided,
    # non-128-aligned reduce that TPU codegen runs at 75-122 GB/s (~100
    # ms/step across the full-width train step, profiled round 3).  Reducing
    # over hw keeps C on the lanes (dense vector adds); the cg-combine then
    # touches only (b, c) elements.  One-pass moments (E[x^2]-E[x]^2, the
    # flax use_fast_variance trick) with f32 accumulation; same math, so the
    # torch-GroupNorm parity gates pin the numerics.
    ch_sum = jnp.sum(xf, axis=1)  # (b, c) — lane-preserving reduce
    ch_sq = jnp.sum(jnp.square(xf), axis=1)
    g_sum = jnp.sum(ch_sum.reshape(b, num_groups, cg), axis=2)  # tiny
    g_sq = jnp.sum(ch_sq.reshape(b, num_groups, cg), axis=2)
    n = jnp.float32(h * w * cg)
    mean_g = g_sum / n
    var_g = jnp.maximum(g_sq / n - jnp.square(mean_g), 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # Fold group stats + affine into per-channel scale/bias (tiny tensors),
    # leaving ONE fused elementwise sweep over the activation.
    gamma32 = gamma.astype(jnp.float32)
    scale_c = jnp.repeat(rstd_g, cg, axis=1) * gamma32[None]  # (b, c)
    bias_c = (
        beta.astype(jnp.float32)[None]
        - jnp.repeat(mean_g * rstd_g, cg, axis=1) * gamma32[None]
    )
    y = xf * scale_c[:, None, :] + bias_c[:, None, :]
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype).reshape(b, h, w, c)


register_op("group_norm", "ref", _group_norm_ref)


def _pallas_eligible(x: jnp.ndarray) -> bool:
    # Small maps take the single-block kernel; large maps the tiled two-pass
    # kernel; both need lane-aligned channels.
    return x.ndim == 4 and x.shape[-1] % 128 == 0


def _fits_single_block(x: jnp.ndarray) -> bool:
    b, h, w, c = x.shape
    return (h * w) * c * 4 <= 6 * 1024 * 1024


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


def _gn_tiled_pallas_fwd(x, gamma, beta, num_groups, eps, silu, block=None):
    """Two-pass tiled GroupNorm+SiLU for maps too large for one VMEM block
    (e.g. the VAE decoder's 512x512x128 activations — 17% faster than the XLA
    chain on v5e, BENCH_NOTES.md).  Pass 1 accumulates per-channel moments by
    revisiting one (8, C) output block across the hw grid; group statistics
    fold into per-channel scale/bias on the host side of the jaxpr; pass 2 is
    one fused read->normalise->SiLU->write sweep."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    hw = h * w
    if block is None:
        # Keep the f32 working block ~4MB of VMEM whatever the channel count
        # (skip-concat activations reach C=1920 in the SD UNet up path).
        block = max(256, min(4096, (4 * 1024 * 1024 // (c * 4)) // 256 * 256))
    x2 = x.reshape(b, hw, c)
    nblk = (hw + block - 1) // block
    pad = nblk * block - hw
    if pad:
        x2 = jnp.pad(x2, ((0, 0), (0, pad), (0, 0)))

    def reduce_kernel(x_ref, sum_ref, sq_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            sum_ref[0] = jnp.zeros_like(sum_ref[0])
            sq_ref[0] = jnp.zeros_like(sq_ref[0])

        xv = x_ref[0].astype(jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, xv.shape, 0) + i * block
        xv = jnp.where(row < hw, xv, 0.0)
        sum_ref[0] += jnp.broadcast_to(jnp.sum(xv, axis=0, keepdims=True), (8, c))
        sq_ref[0] += jnp.broadcast_to(jnp.sum(xv * xv, axis=0, keepdims=True), (8, c))

    sums, sqs = pl.pallas_call(
        reduce_kernel,
        grid=(b, nblk),
        in_specs=[pl.BlockSpec((1, block, c), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, 8, c), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
        ),
    )(x2)
    cg = c // num_groups
    g_sum = sums[:, 0, :].reshape(b, num_groups, cg).sum(-1)
    g_sq = sqs[:, 0, :].reshape(b, num_groups, cg).sum(-1)
    n = hw * cg
    mean_g = g_sum / n
    rstd_g = jax.lax.rsqrt(g_sq / n - mean_g * mean_g + eps)
    mean_c = jnp.repeat(mean_g, cg, axis=1)
    rstd_c = jnp.repeat(rstd_g, cg, axis=1)
    gamma32 = gamma.astype(jnp.float32)[None]
    scale_c = rstd_c * gamma32
    bias_c = beta.astype(jnp.float32)[None] - mean_c * rstd_c * gamma32
    sb = jnp.stack([scale_c, bias_c], axis=1)  # (b, 2, c)
    sb16 = jnp.broadcast_to(sb[:, :, None, :], (b, 2, 8, c)).reshape(b, 16, c)

    def apply_kernel(x_ref, sb_ref, o_ref):
        xv = x_ref[0].astype(jnp.float32)
        y = xv * sb_ref[0, 0][None, :] + sb_ref[0, 8][None, :]
        if silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0] = y.astype(o_ref.dtype)

    y2 = pl.pallas_call(
        apply_kernel,
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, block, c), lambda b_, i: (b_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, c), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, c), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nblk * block, c), x.dtype),
    )(x2, sb16)
    return y2[:, :hw, :].reshape(b, h, w, c)


def _gn_silu_pallas(x, gamma, beta, num_groups, eps, silu):
    if not _pallas_eligible(x):
        return _group_norm_ref(x, gamma, beta, num_groups, eps, silu)
    fwd = _gn_silu_pallas_fwd if _fits_single_block(x) else _gn_tiled_pallas_fwd

    @jax.custom_vjp
    def _op(x, gamma, beta):
        return fwd(x, gamma, beta, num_groups, eps, silu)

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
    """GroupNorm over NHWC with optional fused SiLU.

    'auto' resolves to 'ref' for this op: measured end-to-end on v5e, XLA's
    fusion of the normalise chain into neighbouring convs beats the
    standalone Pallas kernels (35.7 vs 29.5 one-step img/s) even though the
    tiled kernel wins in isolation (BENCH_NOTES.md).  The Pallas paths remain
    available with impl='pallas' (and stay parity-gated) for fusion-hostile
    surroundings.
    """
    assert x.shape[-1] % num_groups == 0
    pallas_ok = _pallas_eligible(x) if impl == "pallas" else False
    fn = impl_for("group_norm", impl, pallas_ok=pallas_ok)
    return fn(x, gamma, beta, num_groups, eps, silu)


def group_norm_silu(x, gamma, beta, num_groups=32, eps=1e-5, impl=None):
    return group_norm(x, gamma, beta, num_groups, eps, silu=True, impl=impl)
