"""Training state + optimizer stack for SiD distillation.

The reference holds three whole UNet modules plus two torch Adam optimizers
and an EMA clone as python objects (``training/sid_training_loop.py:283-325``).
Here the equivalent is one immutable pytree — params for the generator theta,
the fake score psi, psi/theta Adam states, and the EMA copy — so the entire
update is a single jitted, donatable function and checkpointing is one
``orbax`` save.

Optimizer parity (``sid_train.py:220-226``, ``sid_training_loop.py:289-292``):
Adam with betas (0.0, 0.999), lr 1e-6, eps 1e-8 (1e-6 under half precision).
The reference's gradient NaN hygiene — ``nan_to_num(grad, 0, +-1e5)`` before
every step (``sid_training_loop.py:458-460,541-543``) — is an optax
``GradientTransformation`` chained in front of Adam, and the fp16-only
``clip_grad_value_(1)`` (``:545-547``) maps to an optional clip stage.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

Params = Any


def nan_to_num_grads(limit: float = 1e5) -> optax.GradientTransformation:
    """Replace NaN->0 and clamp +-inf to +-limit in every gradient leaf."""

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=limit, neginf=-limit), updates
        )
        return updates, state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


def make_optimizer(
    lr: float = 1e-6,
    b1: float = 0.0,
    b2: float = 0.999,
    eps: float = 1e-8,
    grad_clip_value: Optional[float] = None,
) -> optax.GradientTransformation:
    stages = [nan_to_num_grads()]
    if grad_clip_value is not None:
        stages.append(optax.clip(grad_clip_value))
    stages.append(optax.adam(learning_rate=lr, b1=b1, b2=b2, eps=eps))
    return optax.chain(*stages)


@flax.struct.dataclass
class SiDState:
    """Everything that changes during distillation, as one pytree.

    ``nimg`` is the number of images trained on (the reference's ``cur_nimg``,
    driving the EMA ramp-up at ``sid_training_loop.py:553-565``).
    """

    step: jnp.ndarray  # () int32
    nimg: jnp.ndarray  # () int64-ish float32 to avoid overflow at 200M imgs
    params_G: Params
    params_fake: Params
    ema: Params
    opt_G: optax.OptState
    opt_fake: optax.OptState


def init_state(
    params_unet: Params,
    opt_g: optax.GradientTransformation,
    opt_fake: optax.GradientTransformation,
    resume_nimg: int = 0,
    params_fake: Optional[Params] = None,
) -> SiDState:
    """Start G, psi and EMA from the (teacher) UNet params — the reference's
    deepcopy init (``sid_training_loop.py:284-287,325``).

    Each copy gets its own device buffers: the train step donates the whole
    state, and XLA rejects donating one buffer aliased into several arguments
    (the caller typically also passes the same pytree as the frozen teacher).
    """
    copy = lambda tree: jax.tree_util.tree_map(lambda p: jnp.asarray(p).copy(), tree)
    params_g = copy(params_unet)
    # psi defaults to a full UNet clone; a LoRA factor tree may be passed
    # instead (with the matching fake_transform in the train step).
    params_fake = copy(params_fake) if params_fake is not None else copy(params_unet)
    return SiDState(
        step=jnp.zeros((), jnp.int32),
        nimg=jnp.asarray(float(resume_nimg), jnp.float32),
        params_G=params_g,
        params_fake=params_fake,
        ema=copy(params_unet),
        opt_G=opt_g.init(params_g),
        opt_fake=opt_fake.init(params_fake),
    )
