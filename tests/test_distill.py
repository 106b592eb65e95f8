"""Distillation step tests on the tiny model (SURVEY.md §4 'do better').

Covers: a full two-phase train step runs and produces finite losses; params,
psi and EMA all move; EMA ramp math matches the closed form; the NaN-hygiene
optimizer stage zeroes/clamps bad grads; the step works unchanged over an
8-device dp x fsdp mesh (the multi-node-without-a-cluster test).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sid_lsg_tpu import models
from sid_lsg_tpu.diffusion import DDPMScheduler
from sid_lsg_tpu.parallel import make_mesh, shard_batch, shard_params
from sid_lsg_tpu.training import (
    DistillConfig,
    SiDState,
    ema_beta,
    init_state,
    make_optimizer,
    make_train_step,
    nan_to_num_grads,
    init_state as _init_state,
)

L, D = 8, 32  # text length / cross-attn width for the tiny model


def tiny_setup(a_rounds=1, mb=2, **cfg_kw):
    sd = models.TINY
    unet = models.UNet2DCondition(sd.unet)
    rng = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, sd.unet.sample_size, sd.unet.sample_size, 4))
    emb0 = jnp.zeros((1, L, D))
    params = unet.init(rng, lat, jnp.zeros((1,), jnp.int32), emb0)["params"]
    apply = lambda p, x, t, c: unet.apply({"params": p}, x, t, c)
    scheduler = DDPMScheduler()
    cfg = DistillConfig(
        latent_size=sd.unet.sample_size, batch_size=a_rounds * mb, **cfg_kw
    )
    opt_g = make_optimizer(lr=1e-4)
    opt_f = make_optimizer(lr=1e-4)
    step = make_train_step(apply, scheduler, cfg, opt_g, opt_f)
    state = init_state(params, opt_g, opt_f)
    batch = {
        "emb_fake": jax.random.normal(jax.random.PRNGKey(1), (a_rounds, mb, L, D)),
        "emb_g": jax.random.normal(jax.random.PRNGKey(2), (a_rounds, mb, L, D)),
        "uncond_emb": jnp.zeros((L, D)),
    }
    return step, state, params, batch


def tree_l2_diff(a, b):
    return sum(
        float(jnp.sum(jnp.square(x - y)))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def test_train_step_runs_and_updates():
    step, state, params0, batch = tiny_setup(a_rounds=2, mb=2, cfg_train_fake=1.5,
                                             cfg_eval_fake=1.5, cfg_eval_real=1.5)
    jstep = jax.jit(step)
    state1, m1 = jstep(state, params0, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(m1["fake_score_loss"]))
    assert np.isfinite(float(m1["g_loss"]))
    assert int(m1["fake_valid"]) == 4 and int(m1["g_valid"]) == 4
    assert tree_l2_diff(state1.params_fake, params0) > 0
    assert tree_l2_diff(state1.params_G, params0) > 0
    # nimg=0 at first step -> beta=0 -> EMA == new generator params.
    assert tree_l2_diff(state1.ema, state1.params_G) == 0
    state2, m2 = jstep(state1, params0, batch, jax.random.PRNGKey(4))
    assert int(state2.step) == 2
    assert float(state2.nimg) == 2 * 4
    # Second step: nimg>0 -> beta in (0,1) -> EMA between old and new.
    assert tree_l2_diff(state2.ema, state2.params_G) > 0


def test_train_step_alpha_form_and_vpred():
    step, state, params0, batch = tiny_setup(alpha=1.2)
    _, m = jax.jit(step)(state, params0, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["g_loss"]))
    # v-prediction branch.
    sd = models.TINY
    unet = models.UNet2DCondition(sd.unet)
    apply = lambda p, x, t, c: unet.apply({"params": p}, x, t, c)
    from sid_lsg_tpu.diffusion.ddpm import SchedulerConfig

    sched = DDPMScheduler(SchedulerConfig(prediction_type="v_prediction"))
    cfg = DistillConfig(latent_size=sd.unet.sample_size, batch_size=2)
    opt = make_optimizer(lr=1e-4)
    vstep = make_train_step(apply, sched, cfg, opt, opt)
    vstate = init_state(state.params_G, opt, opt)
    _, mv = jax.jit(vstep)(vstate, params0, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(mv["fake_score_loss"]))


def test_ema_beta_ramp():
    cfg = DistillConfig(batch_size=512, ema_halflife_kimg=500, ema_rampup_ratio=0.05)
    assert float(ema_beta(cfg, jnp.float32(0.0))) == 0.0
    # Ramp active: halflife = nimg * 0.05.
    nimg = 100_000.0
    expect = 0.5 ** (512 / (nimg * 0.05))
    assert np.isclose(float(ema_beta(cfg, jnp.float32(nimg))), expect, rtol=1e-5)
    # Saturated: halflife = 500k imgs.
    nimg = 1e9
    expect = 0.5 ** (512 / 500_000.0)
    assert np.isclose(float(ema_beta(cfg, jnp.float32(nimg))), expect, rtol=1e-5)


def test_nan_to_num_grads():
    tx = nan_to_num_grads()
    grads = {"w": jnp.array([1.0, jnp.nan, jnp.inf, -jnp.inf])}
    out, _ = tx.update(grads, tx.init(None))
    np.testing.assert_allclose(np.asarray(out["w"]), [1.0, 0.0, 1e5, -1e5])


def test_train_step_on_mesh():
    """Full step over a dp=4 x fsdp=2 mesh: shardings propagate, result finite."""
    step, state, params0, batch = tiny_setup(mb=8, cfg_train_fake=1.5)
    mesh = make_mesh(fsdp=2)
    assert mesh.shape == {"dp": 4, "fsdp": 2}
    state = jax.tree_util.tree_map(jnp.asarray, state)
    sharded_state = SiDState(
        step=state.step,
        nimg=state.nimg,
        params_G=shard_params(state.params_G, mesh),
        params_fake=shard_params(state.params_fake, mesh),
        ema=shard_params(state.ema, mesh),
        opt_G=jax.tree_util.tree_map(lambda x: x, state.opt_G),
        opt_fake=state.opt_fake,
    )
    teacher = shard_params(params0, mesh)
    state1, m = jax.jit(step)(sharded_state, teacher, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["fake_score_loss"]))
    assert np.isfinite(float(m["g_loss"]))


def test_train_step_multistep_generator():
    """num_steps=2 generator (sid_sd_util.py:176-185 multistep branch)."""
    step, state, params0, batch = tiny_setup(num_steps=2)
    _, m = jax.jit(step)(state, params0, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["fake_score_loss"]))
    assert np.isfinite(float(m["g_loss"]))


def test_low_mem_adam_matches_optax():
    """low_mem_state Adam == optax.adam when the state dtype is f32 (b1=0
    drops mu exactly); bf16 state stays within its quantisation error."""
    import optax

    from sid_lsg_tpu.training.state import make_optimizer, scale_by_adam_low_mem

    params = {"w": jnp.array([0.5, -1.2, 3.0]), "b": jnp.array([[0.1, 0.2]])}
    grads_seq = [
        {"w": jnp.array([0.1, -0.3, 0.02]), "b": jnp.array([[0.5, -0.1]])},
        {"w": jnp.array([-0.2, 0.1, 1.0]), "b": jnp.array([[0.0, 0.3]])},
        {"w": jnp.array([0.05, 0.0, -0.5]), "b": jnp.array([[1.0, 1.0]])},
    ]
    ref_opt = optax.adam(1e-2, b1=0.0, b2=0.999, eps=1e-8)
    lm_opt = optax.chain(
        scale_by_adam_low_mem(b1=0.0, b2=0.999, eps=1e-8, state_dtype=jnp.float32),
        optax.scale(-1e-2),
    )
    s_ref, s_lm = ref_opt.init(params), lm_opt.init(params)
    p_ref, p_lm = params, params
    for g in grads_seq:
        u_ref, s_ref = ref_opt.update(g, s_ref, p_ref)
        u_lm, s_lm = lm_opt.update(g, s_lm, p_lm)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_lm = optax.apply_updates(p_lm, u_lm)
    for k in params:
        np.testing.assert_allclose(np.asarray(p_lm[k]), np.asarray(p_ref[k]),
                                   atol=1e-7, rtol=1e-6)
    # mu is genuinely absent with b1=0.
    assert s_lm[0].mu is None

    # bf16 state: close but quantised; full make_optimizer path runs.
    opt = make_optimizer(lr=1e-2, low_mem_state=True)
    s = opt.init(params)
    u, s = opt.update(grads_seq[0], s, params)
    p = optax.apply_updates(params, u)
    u1, _ = ref_opt.update(grads_seq[0], ref_opt.init(params), params)
    want = optax.apply_updates(params, u1)
    for k in params:
        np.testing.assert_allclose(np.asarray(p[k]), np.asarray(want[k]),
                                   atol=5e-3, rtol=5e-3)


def test_make_optimizer_adamw():
    """weight_decay routes to decoupled AdamW (reference --optimizer adamw,
    sid_train.py:155) in both the standard and low-mem paths."""
    import optax

    from sid_lsg_tpu.training.state import make_optimizer

    params = {"w": jnp.array([0.5, -1.2, 3.0])}
    g = {"w": jnp.array([0.1, -0.3, 0.02])}

    opt = make_optimizer(lr=1e-2, weight_decay=0.01)
    u, _ = opt.update(g, opt.init(params), params)
    ref = optax.adamw(1e-2, b1=0.0, b2=0.999, eps=1e-8, weight_decay=0.01)
    u_ref, _ = ref.update(g, ref.init(params), params)
    np.testing.assert_allclose(np.asarray(u["w"]), np.asarray(u_ref["w"]),
                               atol=1e-7, rtol=1e-6)

    # Decay changes the update (vs plain adam) and pulls toward zero.
    plain = make_optimizer(lr=1e-2)
    u_plain, _ = plain.update(g, plain.init(params), params)
    assert not np.allclose(np.asarray(u["w"]), np.asarray(u_plain["w"]))

    # Low-mem + decay: decayed-weights stage applies before the lr scale.
    lm = make_optimizer(lr=1e-2, low_mem_state=True, weight_decay=0.01)
    u_lm, _ = lm.update(g, lm.init(params), params)
    np.testing.assert_allclose(np.asarray(u_lm["w"]), np.asarray(u_ref["w"]),
                               atol=5e-3, rtol=5e-3)
