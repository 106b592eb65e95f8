"""Scaled-dot-product attention: XLA reference + Pallas flash kernel.

This is the xformers-memory-efficient-attention equivalent demanded by the
reference (``sid_sd_util.py:102-113`` enables xformers per-UNet; SURVEY.md §5
"long-context").  Two implementations behind the op registry:

- 'ref': jnp einsum attention with float32 softmax accumulation.  XLA fuses
  this well; it is the default for *training* because the flash backward
  kernel lands in a later milestone (forward-only flash + recompute-bwd would
  materialise the S×S matrix in the VJP anyway).
- 'pallas': blocked online-softmax (flash) forward — O(S) memory, MXU-tiled,
  grid (batch*heads, q_blocks, k_blocks) with the k loop innermost so the
  accumulators live in VMEM scratch across k steps.  Used for inference /
  no-grad paths (sampler eval branch, metric generation).

Layout: (B, H, S, D).  D may be any size (Mosaic pads lanes); kv padding to
the k block size is handled with an in-kernel iota mask against the static
true kv length.
"""

from __future__ import annotations

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


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_fwd(q, k, v, scale, block_q, block_k):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, sq, d = q.shape
    sk = k.shape[2]
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, block_k)
    q_p = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
    k_p = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
    v_p = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
    bh = b * h
    q_p = q_p.reshape(bh, sq_pad, d)
    k_p = k_p.reshape(bh, sk_pad, d)
    v_p = v_p.reshape(bh, sk_pad, d)
    num_k = sk_pad // block_k

    def kernel(q_ref, k_ref, v_ref, o_ref, acc, m_s, l_s):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            m_s[:] = jnp.full_like(m_s, NEG_INF)
            l_s[:] = jnp.zeros_like(l_s)

        qv = q_ref[0].astype(jnp.float32)  # (Bq, D)
        kv = k_ref[0].astype(jnp.float32)  # (Bk, D)
        vv = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            qv, kv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (Bq, Bk)
        # Mask out kv padding for the final k block.
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(col < sk, s, NEG_INF)

        m_prev = m_s[:, 0:1]  # (Bq, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # (Bq, Bk)
        alpha = jnp.exp(m_prev - m_new)  # (Bq, 1)
        l_new = alpha * l_s[:, 0:1] + jnp.sum(p, axis=1, keepdims=True)
        acc[:] = acc[:] * alpha + jax.lax.dot_general(
            p, vv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_s[:, 0:1] = m_new
        l_s[:, 0:1] = l_new

        @pl.when(ki == num_k - 1)
        def _():
            o_ref[0] = (acc[:] / l_s[:, 0:1]).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(bh, sq_pad // block_q, num_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, qi, ki: (b_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, qi, ki: (b_, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, qi, ki: (b_, ki, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b_, qi, ki: (b_, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
    )(q_p, k_p, v_p)
    return out.reshape(b, h, sq_pad, d)[:, :, :sq, :]


def _attention_pallas(q, k, v, scale, causal, block_q=256, block_k=256):
    if causal:
        # Causal path (CLIP text, S=77) is tiny; XLA handles it.
        return _attention_ref(q, k, v, scale, causal)
    sq, sk = q.shape[2], k.shape[2]
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))

    @jax.custom_vjp
    def _op(q, k, v):
        return _flash_fwd(q, k, v, scale, block_q, block_k)

    def _fwd(q, k, v):
        return _op(q, k, v), (q, k, v)

    def _bwd(res, g):
        q, k, v = res
        _, vjp = jax.vjp(lambda a, b_, c: _attention_ref(a, b_, c, scale, causal), q, k, v)
        return vjp(g)

    _op.defvjp(_fwd, _bwd)
    return _op(q, k, v)


register_op("attention", "pallas", _attention_pallas)


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
    return fn(q, k, v, scale, causal)


def flash_attention(q, k, v, scale=None, causal=False):
    """Explicit flash-kernel entry (inference paths)."""
    return attention(q, k, v, scale=scale, causal=causal, impl="pallas")
