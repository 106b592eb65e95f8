"""LoRA fake-score tests: identity at init, targeted updates, full step."""

import jax
import jax.numpy as jnp
import numpy as np

from sid_lsg_tpu import models
from sid_lsg_tpu.training.lora import apply_lora, init_lora, lora_param_count


def _tiny_unet_params():
    sd = models.TINY
    unet = models.UNet2DCondition(sd.unet)
    lat = jnp.zeros((1, 8, 8, 4))
    emb = jnp.zeros((1, 8, 32))
    params = unet.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,), jnp.int32), emb)["params"]
    return unet, params, lat, emb


def test_lora_identity_at_init():
    unet, params, lat, emb = _tiny_unet_params()
    lora = init_lora(jax.random.PRNGKey(1), params, rank=2)
    assert lora_param_count(lora) > 0
    eff = apply_lora(params, lora)
    out_base = unet.apply({"params": params}, lat, jnp.zeros((1,), jnp.int32), emb)
    out_eff = unet.apply({"params": eff}, lat, jnp.zeros((1,), jnp.int32), emb)
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_eff), atol=1e-6)


def test_lora_changes_only_targets():
    _, params, _, _ = _tiny_unet_params()
    lora = init_lora(jax.random.PRNGKey(1), params, rank=2)
    # Perturb one factor pair -> only its kernel changes.
    key = sorted(lora.keys())[0]
    lora[key]["b"] = jnp.ones_like(lora[key]["b"])
    eff = apply_lora(params, lora)
    changed = []

    def compare(a, b, path=""):
        if isinstance(a, dict):
            for k in a:
                compare(a[k], b[k], f"{path}/{k}" if path else k)
        else:
            if not np.allclose(np.asarray(a), np.asarray(b)):
                changed.append(path)

    compare(params, eff)
    assert changed == [f"{key}/kernel"]


def test_lora_train_step():
    from sid_lsg_tpu.diffusion import DDPMScheduler
    from sid_lsg_tpu.training import DistillConfig, init_state, make_optimizer, make_train_step
    from sid_lsg_tpu.training.lora import apply_lora, init_lora

    unet, params, _, _ = _tiny_unet_params()
    apply = lambda p, x, t, c: unet.apply({"params": p}, x, t, c)
    lora0 = init_lora(jax.random.PRNGKey(2), params, rank=2)
    cfg = DistillConfig(latent_size=8, batch_size=2)
    opt = make_optimizer(lr=1e-3)
    step = make_train_step(
        apply, DDPMScheduler(), cfg, opt, opt,
        fake_transform=lambda pf, teacher: apply_lora(teacher, pf),
    )
    state = init_state(params, opt, opt, params_fake=lora0)
    batch = {
        "emb_fake": jnp.ones((1, 2, 8, 32)),
        "emb_g": jnp.ones((1, 2, 8, 32)),
        "uncond_emb": jnp.zeros((8, 32)),
    }
    state1, m = jax.jit(step)(state, params, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["fake_score_loss"]))
    assert np.isfinite(float(m["g_loss"]))
    # LoRA factors moved; structure preserved.
    moved = sum(
        float(jnp.sum(jnp.square(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(state1.params_fake),
            jax.tree_util.tree_leaves(lora0),
        )
    )
    assert moved > 0


def test_snapshot_resume_keeps_lora_structure(tmp_path):
    """--resume <generator snapshot> with a LoRA psi must seed G/EMA from the
    snapshot while params_fake KEEPS the factor tree (regression: it used to
    be overwritten with the full UNet tree, crashing apply_lora at trace)."""
    from sid_lsg_tpu.runtime.checkpoint import export_generator
    from sid_lsg_tpu.training.loop import TrainConfig, Trainer, training_loop

    n_dev = jax.device_count()
    base = dict(model="tiny", batch_size=n_dev, microbatch=n_dev,
                use_bf16=False, fake_score_use_lora=True, seed=3,
                max_ticks=1, kimg_per_tick=0, snapshot_ticks=0,
                state_dump_ticks=0, sample_ticks=0)
    donor = Trainer(TrainConfig(run_dir=str(tmp_path), **base))
    snap = str(tmp_path / "gen.safetensors")
    export_generator(donor.state.ema, snap)
    del donor

    cfg = TrainConfig(run_dir=str(tmp_path / "resumed"), resume=snap, **base)
    import os
    os.makedirs(cfg.run_dir, exist_ok=True)
    state = training_loop(cfg)
    # psi stayed a LoRA factor tree: every entry is an {'a','b'} factor pair.
    assert state.params_fake and all(
        set(f) == {"a", "b"} for f in state.params_fake.values()
    )
    assert int(state.step) >= 1
