"""Scaled-dot-product attention: XLA reference + Pallas flash kernel.

This is the xformers-memory-efficient-attention equivalent demanded by the
reference (``sid_sd_util.py:102-113`` enables xformers per-UNet; SURVEY.md §5
"long-context").  Two implementations behind the op registry:

- 'ref': jnp einsum attention with float32 softmax accumulation (XLA-fused;
  materialises S x S — what the torch reference does with xformers off).
- 'pallas': blocked online-softmax (flash) forward + hand-derived flash
  BACKWARD (dq kernel loops k-blocks, dk/dv kernel loops q-blocks, P
  recomputed from the saved row logsumexp) — O(S) memory in both directions,
  MXU-tiled, accumulators in VMEM scratch.  Numerical parity with 'ref' is
  gated by tests/test_pallas_parity.py (fwd atol 2e-5, grads rtol 1e-3).

Layout: (B, H, S, D).  D may be any size (Mosaic pads lanes); kv padding to
the k block size is handled with an in-kernel iota mask against the static
true kv length.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .registry import impl_for, register_op

NEG_INF = -1e30


def _attention_ref(q, k, v, scale, causal):
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    if causal:
        sq, sk = logits.shape[-2], logits.shape[-1]
        mask = jnp.tril(jnp.ones((sq, sk), dtype=bool), k=sk - sq)
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vf)
    return out.astype(q.dtype)


register_op("attention", "ref", _attention_ref)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_bh(x, s_pad):
    """(B,H,S,D) -> (B*H, s_pad, D)."""
    b, h, s, d = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
    return x.reshape(b * h, s_pad, d)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_fwd(q, k, v, scale, block_q, block_k):
    """Blocked online-softmax forward; also returns the row logsumexp
    (needed by the flash backward)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, sq, d = q.shape
    sk = k.shape[2]
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, block_k)
    q_p = _pad_bh(q, sq_pad)
    k_p = _pad_bh(k, sk_pad)
    v_p = _pad_bh(v, sk_pad)
    bh = b * h
    num_k = sk_pad // block_k

    def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc, m_s, l_s):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            m_s[:] = jnp.full_like(m_s, NEG_INF)
            l_s[:] = jnp.zeros_like(l_s)

        qv = q_ref[0]  # (Bq, D) native dtype -> MXU runs bf16 at full rate
        kv = k_ref[0]  # (Bk, D)
        vv = v_ref[0]
        s = jax.lax.dot_general(
            qv, kv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (Bq, Bk) f32 accumulators
        if sk_pad != sk:
            # Mask out kv padding (reaches only the final k block).  Elided
            # at trace time when sk is block-aligned — true for every SD
            # self-attention level — because the iota+compare+select is 2-3
            # full VPU passes over the logits tile in a VPU-bound kernel
            # (BENCH_NOTES.md round 3).
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
            s = jnp.where(col < sk, s, NEG_INF)

        m_prev = m_s[:, 0:1]  # (Bq, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # (Bq, Bk)
        alpha = jnp.exp(m_prev - m_new)  # (Bq, 1)
        # (Computing sum(p) as an extra p @ ones MXU matmul instead of this
        # VPU lane reduction was measured 12% SLOWER fwd — Mosaic schedules
        # the matmul serially, it does not overlap MXU/VPU; BENCH_NOTES r3.)
        l_new = alpha * l_s[:, 0:1] + jnp.sum(p, axis=1, keepdims=True)
        acc[:] = acc[:] * alpha + jax.lax.dot_general(
            p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_s[:, 0:1] = m_new
        l_s[:, 0:1] = l_new

        @pl.when(ki == num_k - 1)
        def _():
            o_ref[0] = (acc[:] / l_s[:, 0:1]).astype(o_ref.dtype)
            # lse carried sublane-padded: (8, block_q) broadcast rows satisfy
            # the Mosaic (8, 128) block-tiling constraint.
            lse_row = (m_s[:, 0] + jnp.log(l_s[:, 0]))  # (block_q,)
            lse_ref[0] = jnp.broadcast_to(lse_row[None, :], (8, block_q))

    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, sq_pad // block_q, num_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, qi, ki: (b_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, qi, ki: (b_, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, qi, ki: (b_, ki, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b_, qi, ki: (b_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b_, qi, ki: (b_, 0, qi), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, sq_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
    )(q_p, k_p, v_p)
    return (
        out.reshape(b, h, sq_pad, d)[:, :, :sq, :],
        lse[:, 0, :].reshape(b, h, sq_pad)[:, :, :sq],
    )


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_bwd_fused(q, k, v, out, lse, g, scale, block_q, block_k):
    """Single-sweep flash backward (round-2 kernel, TODO.md item).

    One kernel over (bh, k-block, q-block) recomputes s/p ONCE per block pair
    and emits all three gradients: dk/dv accumulate in VMEM scratch across
    q-blocks, while dq is written as per-k-block partial sums (streamed, no
    block revisit) and reduced over the k axis by XLA outside.  Versus the
    two-pass backward this removes the duplicate s/p/dp recomputation (7 -> 5
    MXU matmuls per block pair) and one full sweep of q/k/v/g HBM reads, at
    the cost of a small f32 dq-partial buffer (num_k x S x D per head pair).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, sq, d = q.shape
    sk = k.shape[2]
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, block_k)
    bh = b * h
    q_p = _pad_bh(q, sq_pad)
    k_p = _pad_bh(k, sk_pad)
    v_p = _pad_bh(v, sk_pad)
    g_p = _pad_bh(g, sq_pad)
    o_p = _pad_bh(out, sq_pad)
    lse_p = jnp.pad(lse.reshape(bh, sq), ((0, 0), (0, sq_pad - sq)))
    delta = jnp.sum(g_p.astype(jnp.float32) * o_p.astype(jnp.float32), axis=-1)
    lse8 = jnp.broadcast_to(lse_p[:, None, :], (bh, 8, sq_pad))
    delta8 = jnp.broadcast_to(delta[:, None, :], (bh, 8, sq_pad))
    num_k = sk_pad // block_k
    num_q = sq_pad // block_q

    def kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, d_ref,
               dq_ref, dk_ref, dv_ref, acc_k, acc_v):
        ki = pl.program_id(1)
        qi = pl.program_id(2)

        @pl.when(qi == 0)
        def _():
            acc_k[:] = jnp.zeros_like(acc_k)
            acc_v[:] = jnp.zeros_like(acc_v)

        qv = q_ref[0]
        kv = k_ref[0]
        vv = v_ref[0]
        gv = g_ref[0]
        s = jax.lax.dot_general(qv, kv, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse_ref[0, 0][:, None])
        if sk_pad != sk or sq_pad != sq:
            # Padding mask, elided at trace time for block-aligned shapes
            # (every SD self-attention level).  Strictly the gradients are
            # exact without it — padded k/v/g rows are zero, so every
            # spurious p entry meets a zero operand or a sliced-away output
            # — but it is kept under padding as cheap insurance against
            # non-finite stragglers (exp of unnormalised logits).
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
            p = jnp.where((col < sk) & (row < sq), p, 0.0)
        acc_v[:] += jax.lax.dot_general(p.astype(gv.dtype), gv, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(gv, vv, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - d_ref[0, 0][:, None]) * scale  # (Bq, Bk)
        acc_k[:] += jax.lax.dot_general(ds.astype(qv.dtype), qv, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        dq_ref[0, 0] = jax.lax.dot_general(ds.astype(kv.dtype), kv,
                                           (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
        # dq partials are laid out (num_k, bh, S, D) — k-index OUTERMOST — so
        # the XLA cross-k reduction outside streams contiguous arrays
        # (reducing a middle axis ran at ~220 GB/s, ~2% of the train step;
        # profiled round 3).

        @pl.when(qi == num_q - 1)
        def _():
            dk_ref[0] = acc_k[:].astype(dk_ref.dtype)
            dv_ref[0] = acc_v[:].astype(dv_ref.dtype)

    dq_part, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh, num_k, num_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, ki, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, ki, qi: (b_, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, ki, qi: (b_, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b_, ki, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b_, ki, qi: (b_, 0, qi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b_, ki, qi: (b_, 0, qi), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda b_, ki, qi: (ki, b_, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, ki, qi: (b_, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, ki, qi: (b_, ki, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_k, bh, sq_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, sk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk_pad, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
    )(q_p, k_p, v_p, g_p, lse8, delta8)

    dq = jnp.sum(dq_part, axis=0).astype(q.dtype)
    unpad = lambda x, s: x.reshape(b, h, -1, d)[:, :, :s, :]
    return unpad(dq, sq), unpad(dk, sk), unpad(dv, sk)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_bwd(q, k, v, out, lse, g, scale, block_q, block_k):
    """Flash backward: recompute P blockwise from lse, accumulate dq/dk/dv.

    Two kernels: dq iterates k-blocks per q-block; dk/dv iterate q-blocks per
    k-block.  O(S) memory — never materialises the S x S matrix (the torch
    reference without xformers does, sid_sd_util.py:102-113).  Kept as the
    fallback/verification twin of ``_flash_bwd_fused``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, sq, d = q.shape
    sk = k.shape[2]
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, block_k)
    bh = b * h
    q_p = _pad_bh(q, sq_pad)
    k_p = _pad_bh(k, sk_pad)
    v_p = _pad_bh(v, sk_pad)
    g_p = _pad_bh(g, sq_pad)
    o_p = _pad_bh(out, sq_pad)
    # Padded q rows: lse=-inf would give exp(s - -inf)=inf; use 0 and rely on
    # the column mask + zero g rows to keep contributions zero.
    lse_p = jnp.pad(lse.reshape(bh, sq), ((0, 0), (0, sq_pad - sq)))
    delta = jnp.sum(g_p.astype(jnp.float32) * o_p.astype(jnp.float32), axis=-1)  # (bh, sq_pad)
    # Sublane-padded (bh, 8, S) layout for per-row scalars (Mosaic tiling).
    lse8 = jnp.broadcast_to(lse_p[:, None, :], (bh, 8, sq_pad))
    delta8 = jnp.broadcast_to(delta[:, None, :], (bh, 8, sq_pad))
    num_k = sk_pad // block_k
    num_q = sq_pad // block_q

    def dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, d_ref, dq_ref, acc):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        qv = q_ref[0]
        kv = k_ref[0]
        vv = v_ref[0]
        gv = g_ref[0]
        s = jax.lax.dot_general(qv, kv, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse_ref[0, 0][:, None])
        if sk_pad != sk:  # elided for block-aligned shapes (see fused bwd)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
            p = jnp.where(col < sk, p, 0.0)
        dp = jax.lax.dot_general(gv, vv, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - d_ref[0, 0][:, None]) * scale
        acc[:] += jax.lax.dot_general(ds.astype(kv.dtype), kv, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

        @pl.when(ki == num_k - 1)
        def _():
            dq_ref[0] = acc[:].astype(dq_ref.dtype)

    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, num_q, num_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, qi, ki: (b_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, qi, ki: (b_, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, qi, ki: (b_, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b_, qi, ki: (b_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b_, qi, ki: (b_, 0, qi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b_, qi, ki: (b_, 0, qi), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b_, qi, ki: (b_, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
    )(q_p, k_p, v_p, g_p, lse8, delta8)

    def dkv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, d_ref, dk_ref, dv_ref,
                   acc_k, acc_v):
        qi = pl.program_id(2)

        @pl.when(qi == 0)
        def _():
            acc_k[:] = jnp.zeros_like(acc_k)
            acc_v[:] = jnp.zeros_like(acc_v)

        qv = q_ref[0]
        kv = k_ref[0]
        vv = v_ref[0]
        gv = g_ref[0]
        ki = pl.program_id(1)
        s = jax.lax.dot_general(qv, kv, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse_ref[0, 0][:, None])
        if sk_pad != sk or sq_pad != sq:  # elided when block-aligned (see fused bwd)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
            p = jnp.where((col < sk) & (row < sq), p, 0.0)
        dv_blk = jax.lax.dot_general(p.astype(gv.dtype), gv, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)  # (Bk, D)
        acc_v[:] += dv_blk
        dp = jax.lax.dot_general(gv, vv, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - d_ref[0, 0][:, None]) * scale  # (Bq, Bk)
        acc_k[:] += jax.lax.dot_general(ds.astype(qv.dtype), qv, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

        @pl.when(qi == num_q - 1)
        def _():
            dk_ref[0] = acc_k[:].astype(dk_ref.dtype)
            dv_ref[0] = acc_v[:].astype(dv_ref.dtype)

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, num_k, num_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, ki, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, ki, qi: (b_, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, ki, qi: (b_, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b_, ki, qi: (b_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b_, ki, qi: (b_, 0, qi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b_, ki, qi: (b_, 0, qi), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda b_, ki, qi: (b_, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, ki, qi: (b_, ki, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk_pad, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
    )(q_p, k_p, v_p, g_p, lse8, delta8)

    unpad = lambda x, s: x.reshape(b, h, -1, d)[:, :, :s, :]
    return unpad(dq, sq), unpad(dk, sk), unpad(dv, sk)


def _pick_blocks(d: int):
    """VMEM-aware block sizes, tuned on v5e (BENCH_NOTES.md).

    At the SD UNet head dims (40-160), (512, 1024) runs fwd+bwd 2.1x faster
    than (256, 256) and 3.7x faster than the XLA S x S reference.  Large d
    (e.g. the VAE's single-head d=512) must shrink blocks to fit the ~16MB
    scoped VMEM budget (q/k/v tiles + the block_q x block_k logits tile,
    double-buffered).  ``SIDLSG_FLASH_BLOCKS=q,k`` overrides (tuning sweeps).
    """
    import os

    override = os.environ.get("SIDLSG_FLASH_BLOCKS")
    if override:
        bq, bk = (int(x) for x in override.split(","))
        return bq, bk
    if d <= 128:
        return 512, 1024
    if d <= 256:
        return 512, 512
    return 256, 512


def _attention_pallas(q, k, v, scale, causal, block_q=None, block_k=None):
    if causal:
        # Causal path (CLIP text, S=77) is tiny; XLA handles it.
        return _attention_ref(q, k, v, scale, causal)
    from jax.ad_checkpoint import checkpoint_name

    d = q.shape[3]
    default_q, default_k = _pick_blocks(d)
    block_q = block_q or default_q
    block_k = block_k or default_k
    sq, sk = q.shape[2], k.shape[2]
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))

    @jax.custom_vjp
    def _op(q, k, v):
        return _flash_fwd(q, k, v, scale, block_q, block_k)[0]

    def _fwd(q, k, v):
        out, lse = _flash_fwd(q, k, v, scale, block_q, block_k)
        # Named for selective remat: under nn.remat, the custom-VJP re-runs
        # this fwd to rebuild its residuals, so with policy 'full'/'attn'
        # every flash forward executes TWICE (primal + recompute — measured
        # ~12% of the full-width step, BENCH_NOTES round 3).  Policy 'flash'
        # (models/unet.py) saves exactly these two kernel outputs; q/k/v
        # residuals are rebuilt by the cheap projection recompute and the
        # flash kernel itself drops out of the backward sweep.
        out = checkpoint_name(out, "flash_out")
        lse = checkpoint_name(lse, "flash_lse")
        return out, (q, k, v, out, lse)

    def _bwd(res, g):
        q, k, v, out, lse = res
        bwd = _flash_bwd if _BWD_MODE() == "twopass" else _flash_bwd_fused
        return bwd(q, k, v, out, lse, g, scale, block_q, block_k)

    _op.defvjp(_fwd, _bwd)
    return _op(q, k, v)


def _BWD_MODE() -> str:
    """'fused' (default, single-sweep) or 'twopass' via SIDLSG_FLASH_BWD."""
    import os

    return os.environ.get("SIDLSG_FLASH_BWD", "fused")


register_op("attention", "pallas", _attention_pallas)

# Mesh registered by multi-chip training graphs (Trainer / bench / AOT
# scripts).  GSPMD cannot auto-partition Mosaic custom calls ("Mosaic kernels
# cannot be automatically partitioned"), so when a >1-device mesh is active
# the pallas path must run inside a shard_map manual region, batch-sharded
# over every mesh axis — attention is embarrassingly parallel across batch,
# so per-shard kernels + zero collectives is also the fastest layout.
_SHARD_MESH = None


def set_shard_mesh(mesh) -> None:
    """Declare the mesh jitted training graphs shard over (None to clear).

    Single-device meshes clear the setting: shard_map is only required (and
    only pays off) when XLA would otherwise have to partition the kernel.
    The setting matters at TRACE time only — prefer ``shard_mesh_scope``
    around the traced call so unrelated later jits (eval, sampling) are not
    rerouted through a stale training mesh.
    """
    global _SHARD_MESH
    _SHARD_MESH = mesh if (mesh is not None and mesh.size > 1) else None


@contextlib.contextmanager
def shard_mesh_scope(mesh):
    """Scoped set_shard_mesh: restores the previous mesh on exit."""
    global _SHARD_MESH
    prev = _SHARD_MESH
    set_shard_mesh(mesh)
    try:
        yield
    finally:
        _SHARD_MESH = prev


def _shard_mapped_pallas(q, k, v, scale, causal):
    """Run the flash kernel per-shard under shard_map, batch-sharded over all
    mesh axes.  A batch not divisible by the mesh is zero-PADDED up to the
    next multiple and sliced back — never routed to the unsharded pallas
    path, which fails multi-chip compile with "Mosaic kernels cannot be
    automatically partitioned" (round-2 VERDICT weak #2).  Padded rows cost
    one extra shard-row of compute and produce zeros (uniform softmax over
    zero values), discarded by the final slice."""
    from jax.sharding import PartitionSpec as P

    mesh = _SHARD_MESH
    b = q.shape[0]
    pad = (-b) % mesh.size
    if pad:
        padf = lambda x: jnp.pad(x, ((0, pad), (0, 0), (0, 0), (0, 0)))
        q, k, v = padf(q), padf(k), padf(v)
    spec = P(tuple(mesh.axis_names))
    inner = lambda q_, k_, v_: _attention_pallas(q_, k_, v_, scale, causal)
    out = jax.shard_map(
        inner, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
    return out[:b] if pad else out


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    causal: bool = False,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """softmax(q k^T * scale) v over (B, H, S, D) tensors."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    fn = impl_for("attention", impl, pallas_ok=not causal)
    if fn is _attention_pallas and _SHARD_MESH is not None and not causal:
        return _shard_mapped_pallas(q, k, v, scale, causal)
    return fn(q, k, v, scale, causal)


def flash_attention(q, k, v, scale=None, causal=False):
    """Explicit flash-kernel entry (inference paths)."""
    return attention(q, k, v, scale=scale, causal=causal, impl="pallas")
