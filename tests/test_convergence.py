"""Optimization-direction tests for the distillation step.

Parity and finiteness tests (test_distill.py) would pass with an inverted
gradient or a sign error in either loss; these tests pin the *direction* of
both phases of the SiD-LSG step (reference semantics:
``/root/reference/training/sid_training_loop.py:383-565``):

- the psi (fake score) phase is supervised denoising regression on generator
  samples -> its loss must genuinely DECREASE over training when theta is
  frozen;
- each phase's parameter update must descend its own loss when re-evaluated
  on the identical RNG draw (first-order descent: Adam with b1=0 scales the
  gradient by a positive diagonal, so a correct gradient must reduce the loss
  for a small enough lr).

All on the tiny preset, pure CPU, single device.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sid_lsg_tpu import models
from sid_lsg_tpu.diffusion import DDPMScheduler
from sid_lsg_tpu.training import DistillConfig, init_state, make_optimizer, make_train_step

L, D = 8, 32  # text length / cross-attn width for the tiny model


def _setup(opt_g, opt_fake, mb=4, seed=0, **cfg_kw):
    sd = models.TINY
    unet = models.UNet2DCondition(sd.unet)
    rng = jax.random.PRNGKey(seed)
    lat = jnp.zeros((1, sd.unet.sample_size, sd.unet.sample_size, 4))
    params = unet.init(rng, lat, jnp.zeros((1,), jnp.int32), jnp.zeros((1, L, D)))[
        "params"
    ]
    apply = lambda p, x, t, c: unet.apply({"params": p}, x, t, c)
    cfg = DistillConfig(latent_size=sd.unet.sample_size, batch_size=mb, **cfg_kw)
    step = make_train_step(apply, DDPMScheduler(), cfg, opt_g, opt_fake)
    state = init_state(params, opt_g, opt_fake)
    batch = {
        "emb_fake": jax.random.normal(jax.random.PRNGKey(1), (1, mb, L, D)),
        "emb_g": jax.random.normal(jax.random.PRNGKey(2), (1, mb, L, D)),
        "uncond_emb": jnp.zeros((L, D)),
    }
    return step, state, params, batch


def test_psi_phase_loss_decreases():
    """Theta frozen: psi's denoising loss on the (fixed) generator's samples
    is plain regression and must fall substantially over 40 Adam steps."""
    step, state, teacher, batch = _setup(
        opt_g=optax.set_to_zero(), opt_fake=make_optimizer(lr=2e-3)
    )
    jstep = jax.jit(step, donate_argnums=(0,))
    losses = []
    for _ in range(40):
        state, m = jstep(state, teacher, batch, jax.random.PRNGKey(7))
        losses.append(float(m["fake_score_loss"]))
    losses = np.asarray(losses)
    assert np.all(np.isfinite(losses))
    head, tail = losses[:8].mean(), losses[-8:].mean()
    # Generous bound: regression from the teacher init reliably sheds far
    # more than 25% of the loss in 40 steps on the tiny model.
    assert tail < 0.75 * head, f"psi loss did not converge: {head:.4f} -> {tail:.4f}"


def _loss_on_same_draw(jstep, state_a, state_b, teacher, batch, key):
    """Run the step from two states whose ``step`` counters match, so the
    internal fold_in(rng, state.step) reproduces the identical z/noise/t
    draw, and return the reported pre-update losses of each phase."""
    _, m_a = jstep(state_a, teacher, batch, key)
    state_b = dataclasses.replace(state_b, step=state_a.step)
    _, m_b = jstep(state_b, teacher, batch, key)
    return m_a, m_b


def test_theta_update_descends_generator_loss():
    """psi frozen: one theta update must reduce the SiD generator loss when
    re-evaluated on the same draw (gradient-sign end-to-end check through the
    sampler + both denoise passes).

    psi must differ from the teacher: at the deepcopy init y_real == y_fake
    identically, so the SiD loss (y_real - y_fake)(y_fake - x)/w is zero as a
    FUNCTION of theta and carries no gradient.  Perturb psi the way a few
    real psi updates would."""
    step, state, teacher, batch = _setup(
        opt_g=make_optimizer(lr=1e-4), opt_fake=optax.set_to_zero()
    )
    keys = iter(jax.random.split(jax.random.PRNGKey(42), 4096))
    state = dataclasses.replace(
        state,
        params_fake=jax.tree_util.tree_map(
            lambda p: p + 0.02 * jax.random.normal(next(keys), p.shape, p.dtype),
            state.params_fake,
        ),
    )
    jstep = jax.jit(step)
    key = jax.random.PRNGKey(11)
    state1, m0 = jstep(state, teacher, batch, key)
    # psi frozen -> the loss landscape theta descended is unchanged.
    state1 = dataclasses.replace(state1, step=state.step)
    _, m1 = jstep(state1, teacher, batch, key)
    l0, l1 = float(m0["g_loss"]), float(m1["g_loss"])
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0, f"theta step did not descend its loss: {l0:.6f} -> {l1:.6f}"


def test_psi_update_descends_fake_score_loss():
    """Theta frozen: one psi update must reduce the fake-score denoising loss
    on the same draw (and the same frozen generator samples)."""
    step, state, teacher, batch = _setup(
        opt_g=optax.set_to_zero(), opt_fake=make_optimizer(lr=1e-4)
    )
    jstep = jax.jit(step)
    key = jax.random.PRNGKey(13)
    state1, m0 = jstep(state, teacher, batch, key)
    state1 = dataclasses.replace(state1, step=state.step)
    _, m1 = jstep(state1, teacher, batch, key)
    l0, l1 = float(m0["fake_score_loss"]), float(m1["fake_score_loss"])
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0, f"psi step did not descend its loss: {l0:.6f} -> {l1:.6f}"
