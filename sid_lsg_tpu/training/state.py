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


def scale_by_adam_low_mem(
    b1: float = 0.0,
    b2: float = 0.999,
    eps: float = 1e-8,
    state_dtype=jnp.bfloat16,
) -> optax.GradientTransformation:
    """Adam with low-memory moment storage for HBM-bound single-chip runs.

    Two savings over ``optax.scale_by_adam``:
    - with ``b1 == 0`` (the SiD config, sid_train.py:220-226) the first moment
      IS the gradient, so no ``mu`` buffer is stored at all (exact, not an
      approximation) — one full param-set of HBM back;
    - the second moment is stored in ``state_dtype`` (bf16 keeps f32's
      exponent range; the ~0.4%% mantissa error enters through a sqrt, so the
      update perturbation is ~0.2%%).  All arithmetic runs in f32.
    """
    drop_mu = b1 == 0.0

    def init(params):
        zeros = lambda p: jnp.zeros(p.shape, state_dtype)
        mu = None if drop_mu else jax.tree_util.tree_map(zeros, params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=mu,
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        f32 = lambda x: x.astype(jnp.float32)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * f32(v) + (1.0 - b2) * jnp.square(f32(g)), state.nu, updates
        )
        if drop_mu:
            mu_hat = jax.tree_util.tree_map(f32, updates)
            mu_store = None
        else:
            mu = jax.tree_util.tree_map(
                lambda m, g: b1 * f32(m) + (1.0 - b1) * f32(g), state.mu, updates
            )
            bc1 = 1.0 - b1 ** count.astype(jnp.float32)
            mu_hat = jax.tree_util.tree_map(lambda m: m / bc1, mu)
            mu_store = jax.tree_util.tree_map(lambda m: m.astype(state_dtype), mu)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        out = jax.tree_util.tree_map(
            lambda m, v: m / (jnp.sqrt(v / bc2) + eps), mu_hat, nu
        )
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=mu_store,
            nu=jax.tree_util.tree_map(lambda v: v.astype(state_dtype), nu),
        )
        return out, new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    lr: float = 1e-6,
    b1: float = 0.0,
    b2: float = 0.999,
    eps: float = 1e-8,
    grad_clip_value: Optional[float] = None,
    low_mem_state: bool = False,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Adam(b1, b2) with NaN hygiene; ``weight_decay`` > 0 gives AdamW
    (decoupled decay — reference ``--optimizer adamw``, sid_train.py:155)."""
    stages = [nan_to_num_grads()]
    if grad_clip_value is not None:
        stages.append(optax.clip(grad_clip_value))
    if low_mem_state:
        stages.append(scale_by_adam_low_mem(b1=b1, b2=b2, eps=eps))
        if weight_decay:
            stages.append(optax.add_decayed_weights(weight_decay))
        stages.append(optax.scale(-lr))
    elif weight_decay:
        stages.append(optax.adamw(learning_rate=lr, b1=b1, b2=b2, eps=eps,
                                  weight_decay=weight_decay))
    else:
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
