"""LoRA adapters for the fake-score network.

Capability parity with the reference's ``--fake_score_use_lora`` option
(``sid_train.py:157``; the commented PEFT wiring at ``sid_sd_util.py:90-100``)
— in the reference this was announced but left disabled.  Here it works: the
fake score psi is parameterised as ``teacher + sum_k scale * A_k B_k`` over
the attention projection kernels, so psi's trainable state and its Adam
moments shrink from a full UNet to a few million parameters (the
sharded-optimizer escape hatch of SURVEY.md §7 hard part #2).

Pure pytree transforms: ``init_lora`` builds the factor tree from the base
param structure; ``apply_lora`` materialises effective params inside the
jitted step (XLA fuses the rank-r update into the consuming matmul's
producer chain; no separate "merged weights" copy lives in HBM).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp

# Attention projections of both self- and cross-attention (diffusers LoRA
# default target set).
DEFAULT_TARGETS: Tuple[str, ...] = ("to_q", "to_k", "to_v", "to_out")


def _iter_kernels(tree: Any, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_kernels(v, path + (k,))
    else:
        yield path, tree


def _is_target(path: Tuple[str, ...], targets: Sequence[str]) -> bool:
    return (
        len(path) >= 2
        and path[-1] == "kernel"
        and any(t in path[-2] for t in targets)
    )


def init_lora(
    rng: jax.Array,
    base_params: Any,
    rank: int = 4,
    targets: Sequence[str] = DEFAULT_TARGETS,
) -> Any:
    """Factor tree {joined/path: {'a': (in,r) normal, 'b': (r,out) zeros}}.

    b starts at zero so LoRA(0) == base exactly (standard LoRA init).
    """
    factors = {}
    for path, leaf in _iter_kernels(base_params):
        if not _is_target(path, targets) or jnp.ndim(leaf) != 2:
            continue
        fan_in, fan_out = leaf.shape
        rng, sub = jax.random.split(rng)
        factors["/".join(path[:-1])] = {
            "a": jax.random.normal(sub, (fan_in, rank), jnp.float32) / jnp.sqrt(fan_in),
            "b": jnp.zeros((rank, fan_out), jnp.float32),
        }
    if not factors:
        raise ValueError("no LoRA target kernels found in base params")
    return factors


def apply_lora(base_params: Any, lora_params: Any, scale: float = 1.0) -> Any:
    """Effective params: target kernels become W + scale * (A @ B)."""

    def walk(tree: Any, path=()):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            p = path + (k,)
            key = "/".join(p)
            if isinstance(v, dict) and key in lora_params and "kernel" in v:
                f = lora_params[key]
                delta = (f["a"] @ f["b"]) * scale
                out[k] = dict(v, kernel=v["kernel"] + delta.astype(v["kernel"].dtype))
            else:
                out[k] = walk(v, p)
        return out

    return walk(base_params)


def lora_param_count(lora_params: Any) -> int:
    return sum(
        int(jnp.size(f[k])) for f in lora_params.values() for k in ("a", "b")
    )
