"""SiDA-style adversarial training tests (tiny model, CPU).

The reference only ANNOUNCES this capability (README.md:12); these tests pin
our implementation: encoder-only UNet tower, GAN loss math, the augmented
two-phase step (finite metrics, both phases influenced), the latent corpus
reader, and the encode_latents CLI roundtrip.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sid_lsg_tpu import models
from sid_lsg_tpu.diffusion import DDPMScheduler
from sid_lsg_tpu.training import (
    DistillConfig, adversarial, init_state, make_optimizer, make_train_step,
)

L, D = 8, 32


def _tiny_unet():
    sd = models.TINY
    unet = models.UNet2DCondition(sd.unet)
    lat = jnp.zeros((1, sd.unet.sample_size, sd.unet.sample_size, 4))
    params = unet.init(
        jax.random.PRNGKey(0), lat, jnp.zeros((1,), jnp.int32), jnp.zeros((1, L, D))
    )["params"]
    return sd, unet, params


def test_encoder_only_features():
    sd, unet, params = _tiny_unet()
    s = sd.unet.sample_size
    x = jax.random.normal(jax.random.PRNGKey(1), (3, s, s, 4))
    t = jnp.full((3,), 100, jnp.int32)
    emb = jax.random.normal(jax.random.PRNGKey(2), (3, L, D))
    feats = unet.apply({"params": params}, x, t, emb, encoder_only=True)
    # 2 levels -> one downsample -> bottleneck at s/2 with the top width.
    assert feats.shape == (3, s // 2, s // 2, sd.unet.block_out_channels[-1])
    assert bool(jnp.all(jnp.isfinite(feats)))
    # The pooled logit responds to the input (gradient is nonzero).
    pool = lambda x: jnp.sum(adversarial.pooled_logit(
        unet.apply({"params": params}, x, t, emb, encoder_only=True)))
    g = jax.grad(pool)(x)
    assert float(jnp.max(jnp.abs(g))) > 0


def test_gan_loss_math():
    real = jnp.asarray([5.0, -5.0])
    fake = jnp.asarray([-5.0, 5.0])
    d = adversarial.d_loss(real, fake, "ns")
    # Confident-correct D -> ~0 loss; confident-wrong -> large.
    assert float(d[0]) < 0.02 and float(d[1]) > 9.0
    g = adversarial.g_loss(fake, "ns")
    assert float(g[0]) > 4.9 and float(g[1]) < 0.01
    dh = adversarial.d_loss(real, fake, "hinge")
    assert float(dh[0]) == 0.0 and float(dh[1]) == 12.0
    assert float(adversarial.g_loss(jnp.asarray([2.0]), "hinge")[0]) == -2.0
    with pytest.raises(ValueError):
        adversarial.d_loss(real, fake, "wgan")


def _adv_setup(adv_weight_D=0.1, adv_weight_G=0.1, a_rounds=1, mb=2, **kw):
    sd, unet, params = _tiny_unet()
    apply = lambda p, x, t, c: unet.apply({"params": p}, x, t, c)
    encode = lambda p, x, t, c: unet.apply({"params": p}, x, t, c, encoder_only=True)
    cfg = DistillConfig(
        latent_size=sd.unet.sample_size, batch_size=a_rounds * mb,
        adv_weight_D=adv_weight_D, adv_weight_G=adv_weight_G, **kw,
    )
    opt = make_optimizer(lr=1e-4)
    step = make_train_step(apply, DDPMScheduler(), cfg, opt, opt,
                           unet_encode=encode)
    state = init_state(params, opt, opt)
    s = sd.unet.sample_size
    k = jax.random.PRNGKey(7)
    batch = {
        "emb_fake": jax.random.normal(jax.random.fold_in(k, 0), (a_rounds, mb, L, D)),
        "emb_g": jax.random.normal(jax.random.fold_in(k, 1), (a_rounds, mb, L, D)),
        "uncond_emb": jnp.zeros((L, D)),
        "lat_real": jax.random.normal(jax.random.fold_in(k, 2), (a_rounds, mb, s, s, 4)),
        "emb_real": jax.random.normal(jax.random.fold_in(k, 3), (a_rounds, mb, L, D)),
    }
    return step, state, params, batch


def test_adversarial_step_runs():
    step, state, params0, batch = _adv_setup(a_rounds=2)
    state1, m = jax.jit(step)(state, params0, batch, jax.random.PRNGKey(3))
    for key in ("fake_score_loss", "g_loss", "adv_d_loss", "adv_g_loss",
                "d_logit_real", "d_logit_fake"):
        assert key in m and np.isfinite(float(m[key])), key
    assert int(m["fake_valid"]) == 4 and int(m["g_valid"]) == 4


def test_adversarial_nan_real_row_excluded():
    """A corrupt (NaN) real-latent row — the mmap'd encode_latents failure
    mode — must cost only its own contribution: D metrics stay finite and
    unpolluted, the row's d_loss term drops out, and psi still takes a
    finite, nonzero update (no backward NaN-poisoning + nan_to_num wipe of
    whole gradient tensors)."""
    step, state, params0, batch = _adv_setup()
    rng = jax.random.PRNGKey(3)
    clean_state, clean_m = jax.jit(step)(state, params0, batch, rng)

    bad = dict(batch)
    bad["lat_real"] = batch["lat_real"].at[0, 0].set(jnp.nan)
    nan_state, m = jax.jit(step)(state, params0, bad, rng)

    for key in ("fake_score_loss", "g_loss", "adv_d_loss", "adv_g_loss",
                "d_logit_real", "d_logit_fake"):
        assert np.isfinite(float(m[key])), key
    # SiD terms don't touch lat_real: identical to the clean run.
    assert np.isclose(float(m["fake_score_loss"]),
                      float(clean_m["fake_score_loss"]), rtol=1e-5)
    # The dropped real row removes one softplus(-logit_real) > 0 term.
    assert float(m["adv_d_loss"]) < float(clean_m["adv_d_loss"])
    # psi still updates, finitely.
    deltas = [x - y for x, y in zip(
        jax.tree_util.tree_leaves(nan_state.params_fake),
        jax.tree_util.tree_leaves(params0))]
    assert all(bool(jnp.all(jnp.isfinite(d))) for d in deltas)
    assert sum(float(jnp.sum(jnp.abs(d))) for d in deltas) > 0


def test_adversarial_term_changes_updates():
    """The adversarial weights must actually steer BOTH phases: compare one
    step with weights on vs off (identical RNG and batch)."""
    step_adv, state_a, params0, batch = _adv_setup()
    step_off, state_o, _, _ = _adv_setup(adv_weight_D=0.0, adv_weight_G=0.0)
    rng = jax.random.PRNGKey(3)
    sa, ma = jax.jit(step_adv)(state_a, params0, batch, rng)
    so, mo = jax.jit(step_off)(state_o, params0, batch, rng)
    # The SiD parts of the losses are computed identically...
    assert np.isclose(float(ma["fake_score_loss"]), float(mo["fake_score_loss"]),
                      rtol=1e-4)
    assert "adv_d_loss" not in mo
    # ...but the applied updates differ in both phases.
    d_psi = sum(float(jnp.sum(jnp.abs(x - y))) for x, y in zip(
        jax.tree_util.tree_leaves(sa.params_fake),
        jax.tree_util.tree_leaves(so.params_fake)))
    d_g = sum(float(jnp.sum(jnp.abs(x - y))) for x, y in zip(
        jax.tree_util.tree_leaves(sa.params_G),
        jax.tree_util.tree_leaves(so.params_G)))
    assert d_psi > 0 and d_g > 0


def test_adversarial_requires_encoder():
    sd, unet, params = _tiny_unet()
    apply = lambda p, x, t, c: unet.apply({"params": p}, x, t, c)
    cfg = DistillConfig(latent_size=sd.unet.sample_size, batch_size=2,
                        adv_weight_D=0.1)
    opt = make_optimizer(lr=1e-4)
    with pytest.raises(ValueError, match="unet_encode"):
        make_train_step(apply, DDPMScheduler(), cfg, opt, opt)


def _pixel_setup(adv_weight_D=0.1, adv_weight_G=0.1, a_rounds=1, mb=2, **kw):
    """Distill step with the PIXEL discriminator tower (--adv_tower dino):
    VAE decode + frozen TINY_VIT DINO + trainable spectral heads, mirroring
    the Trainer wiring in training/loop.py."""
    from sid_lsg_tpu.models.stylegan_discriminator import (
        TINY_VIT, ProjectedDiscriminator,
    )

    sd, unet, params = _tiny_unet()
    apply = lambda p, x, t, c: unet.apply({"params": p}, x, t, c)
    s = sd.unet.sample_size
    vae = models.AutoencoderKL(sd.vae)
    vae_params = vae.init(
        jax.random.PRNGKey(4), jnp.zeros((1, sd.resolution, sd.resolution, 3))
    )["params"]
    disc = ProjectedDiscriminator(c_dim=D, vit=TINY_VIT, power_iters=2)
    dvars = disc.init(
        jax.random.PRNGKey(5),
        jnp.zeros((1, 3, sd.resolution, sd.resolution)), jnp.zeros((1, D)),
    )
    dparams = dict(dvars["params"])
    dino = dparams.pop("dino")
    pixel_disc, decode_params = adversarial.make_pixel_disc(
        vae, disc, sd.vae.scaling_factor)
    frozen = {"vae": decode_params(vae_params), "dino": dino,
              "spectral": dict(dvars["spectral"])}

    cfg = DistillConfig(
        latent_size=s, batch_size=a_rounds * mb, adv_tower="dino",
        adv_weight_D=adv_weight_D, adv_weight_G=adv_weight_G, **kw,
    )
    opt = make_optimizer(lr=1e-4)
    step = make_train_step(apply, DDPMScheduler(), cfg, opt, opt,
                           pixel_disc=pixel_disc)
    state = init_state(params, opt, opt,
                       params_fake={"psi": params, "disc": dparams})
    k = jax.random.PRNGKey(7)
    batch = {
        "emb_fake": jax.random.normal(jax.random.fold_in(k, 0), (a_rounds, mb, L, D)),
        "emb_g": jax.random.normal(jax.random.fold_in(k, 1), (a_rounds, mb, L, D)),
        "uncond_emb": jnp.zeros((L, D)),
        "lat_real": jax.random.normal(jax.random.fold_in(k, 2), (a_rounds, mb, s, s, 4)),
        "emb_real": jax.random.normal(jax.random.fold_in(k, 3), (a_rounds, mb, L, D)),
        "disc_frozen": frozen,
    }
    return step, state, params, batch


def test_pixel_tower_step_runs():
    step, state, params0, batch = _pixel_setup(a_rounds=2)
    state1, m = jax.jit(step)(state, params0, batch, jax.random.PRNGKey(3))
    for key in ("fake_score_loss", "g_loss", "adv_d_loss", "adv_g_loss",
                "d_logit_real", "d_logit_fake"):
        assert key in m and np.isfinite(float(m[key])), key
    # The D loss trains the spectral heads (inside params_fake['disc']).
    d_heads = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(state1.params_fake["disc"]),
        jax.tree_util.tree_leaves(state.params_fake["disc"])))
    assert d_heads > 0
    # ...and psi still trains through its denoising loss.
    d_psi = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(state1.params_fake["psi"]),
        jax.tree_util.tree_leaves(state.params_fake["psi"])))
    assert d_psi > 0


def test_pixel_tower_g_term_steers_theta():
    """adv_weight_G through the pixel judge must change the theta update
    (gradient flows through VAE decode + DINO into the generator)."""
    step_on, state_on, params0, batch = _pixel_setup(adv_weight_G=0.1)
    step_off, state_off, _, _ = _pixel_setup(adv_weight_G=0.0)
    rng = jax.random.PRNGKey(3)
    sa, ma = jax.jit(step_on)(state_on, params0, batch, rng)
    so, mo = jax.jit(step_off)(state_off, params0, batch, rng)
    assert "adv_g_loss" in ma and "adv_g_loss" not in mo
    d_g = sum(float(jnp.sum(jnp.abs(x - y))) for x, y in zip(
        jax.tree_util.tree_leaves(sa.params_G),
        jax.tree_util.tree_leaves(so.params_G)))
    assert d_g > 0


def test_pixel_tower_requires_pixel_disc():
    sd, unet, params = _tiny_unet()
    apply = lambda p, x, t, c: unet.apply({"params": p}, x, t, c)
    cfg = DistillConfig(latent_size=sd.unet.sample_size, batch_size=2,
                        adv_weight_D=0.1, adv_tower="dino")
    opt = make_optimizer(lr=1e-4)
    with pytest.raises(ValueError, match="pixel_disc"):
        make_train_step(apply, DDPMScheduler(), cfg, opt, opt)
    with pytest.raises(ValueError, match="adv_tower"):
        make_train_step(apply, DDPMScheduler(), cfg.__class__(
            latent_size=sd.unet.sample_size, batch_size=2,
            adv_weight_D=0.1, adv_tower="vgg"), opt, opt)


def test_pixel_tower_trainer_smoke(tmp_path):
    """Trainer-level wiring of --adv_tower dino (tiny preset, one step on the
    suite's 8-device mesh): pixel_disc construction, params_fake {psi,disc}
    wrapping, disc_frozen batch placement."""
    from sid_lsg_tpu.training.loop import TrainConfig, Trainer

    n_dev = jax.device_count()
    cfg = TrainConfig(
        run_dir=str(tmp_path), model="tiny", batch_size=n_dev,
        microbatch=n_dev, adv_weight_D=0.1, adv_weight_G=0.01,
        adv_tower="dino", adv_vit="tiny", use_bf16=False, seed=1,
    )
    tr = Trainer(cfg)
    assert set(tr.state.params_fake) == {"psi", "disc"}
    assert tr._disc_frozen is not None
    batch = tr.next_batch()
    assert "disc_frozen" in batch
    state1, m = tr.train_step(tr.state, tr.teacher, batch, jax.random.PRNGKey(0))
    for key in ("adv_d_loss", "adv_g_loss", "d_logit_real", "d_logit_fake"):
        assert key in m and np.isfinite(float(m[key])), key


def test_pixel_tower_spectral_u_checkpointed(tmp_path):
    """The persistent spectral-norm u must survive save_state/restore_state
    (torch spectral_norm keeps u in the state_dict the reference snapshots);
    a resume that silently reset u to init would re-enter the 6-11%
    sigma-under-estimate regime this suite measures elsewhere."""
    from sid_lsg_tpu.training.loop import TrainConfig, Trainer

    n_dev = jax.device_count()
    mk = lambda d: TrainConfig(
        run_dir=str(d), model="tiny", batch_size=n_dev, microbatch=n_dev,
        adv_weight_D=0.1, adv_weight_G=0.01, adv_tower="dino",
        adv_vit="tiny", use_bf16=False, seed=1,
    )
    tr = Trainer(mk(tmp_path))
    init_u = jax.tree_util.tree_map(np.asarray, tr._disc_frozen["spectral"])
    # Stand-in for run()'s per-step refresh: give u a value distinct from
    # init (persistence is what's under test; refresh math has its own test).
    tr._disc_frozen = dict(
        tr._disc_frozen,
        spectral=jax.tree_util.tree_map(lambda x: x + 0.5,
                                        tr._disc_frozen["spectral"]),
    )
    drifted = jax.tree_util.tree_map(np.asarray, tr._disc_frozen["spectral"])
    tr.save_state(0)
    tr.ckpt_mgr.close()

    tr2 = Trainer(mk(tmp_path))
    assert tr2.restore_state()
    restored = jax.tree_util.tree_map(np.asarray, tr2._disc_frozen["spectral"])
    flat = lambda t: jax.tree_util.tree_leaves(t)
    assert all(np.allclose(a, b) for a, b in zip(flat(restored), flat(drifted)))
    assert any(not np.allclose(a, b) for a, b in zip(flat(restored), flat(init_u)))


def test_pre_spectral_checkpoint_fallback(tmp_path, capsys):
    """An old-layout checkpoint (bare SiDState, no spectral-u entry) must
    still restore under the adversarial trainer — via the documented fallback
    that leaves u at init — and must SAY so (ADVICE r4: the silent bare-except
    fallback also masked unrelated restore failures)."""
    from sid_lsg_tpu.runtime.checkpoint import CheckpointManager
    from sid_lsg_tpu.training.loop import TrainConfig, Trainer

    n_dev = jax.device_count()
    mk = lambda: TrainConfig(
        run_dir=str(tmp_path), model="tiny", batch_size=n_dev,
        microbatch=n_dev, adv_weight_D=0.1, adv_weight_G=0.01,
        adv_tower="dino", adv_vit="tiny", use_bf16=False, seed=1,
    )
    tr = Trainer(mk())
    init_u = jax.tree_util.tree_map(np.asarray, tr._disc_frozen["spectral"])
    # Simulate a pre-spectral-era checkpoint: the bare state, no wrapper.
    mgr = CheckpointManager(os.path.join(str(tmp_path), "checkpoints"))
    mgr.save(0, tr.state)
    mgr.wait()
    mgr.close()

    tr2 = Trainer(mk())
    tr2._disc_frozen = dict(
        tr2._disc_frozen,
        spectral=jax.tree_util.tree_map(lambda x: x + 0.5,
                                        tr2._disc_frozen["spectral"]),
    )
    assert tr2.restore_state()
    out = capsys.readouterr().out
    assert "pre-spectral layout" in out
    # u fell back to whatever the trainer holds — NOT restored from disk; the
    # step counter did restore through the fallback template.
    assert int(tr2.state.step) == int(tr.state.step)
    flat = jax.tree_util.tree_leaves
    drifted = jax.tree_util.tree_map(np.asarray, tr2._disc_frozen["spectral"])
    assert all(np.allclose(a, b + 0.5)
               for a, b in zip(flat(drifted), flat(init_u)))


def test_pixel_tower_on_mesh():
    """Pixel tower over a dp=4 x fsdp=2 mesh: the VAE-decode + DINO judge
    shards along the batch with the replicated disc_frozen entry."""
    from sid_lsg_tpu.parallel import make_mesh, shard_batch, shard_params
    from sid_lsg_tpu.parallel.mesh import batch_shardings, replicated_sharding
    from sid_lsg_tpu.training import SiDState

    step, state, params0, batch = _pixel_setup(mb=8)
    mesh = make_mesh(fsdp=2)
    state = jax.tree_util.tree_map(jnp.asarray, state)
    sharded_state = SiDState(
        step=state.step, nimg=state.nimg,
        params_G=shard_params(state.params_G, mesh),
        params_fake=shard_params(state.params_fake, mesh),
        ema=shard_params(state.ema, mesh),
        opt_G=state.opt_G, opt_fake=state.opt_fake,
    )
    teacher = shard_params(params0, mesh)
    sh = batch_shardings(batch, mesh)
    placed = {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
    assert placed["disc_frozen"] is not batch["disc_frozen"]
    state1, m = jax.jit(step)(sharded_state, teacher, placed,
                              jax.random.PRNGKey(0))
    assert np.isfinite(float(m["adv_d_loss"]))
    assert np.isfinite(float(m["adv_g_loss"]))
    assert np.isfinite(float(m["fake_score_loss"]))


def test_snapshot_resume_keeps_pixel_tower_structure(tmp_path):
    """--resume <generator snapshot> under --adv_tower dino: G/EMA and the
    full psi are seeded from the snapshot, the {'psi','disc'} wrapper and the
    spectral heads survive."""
    from sid_lsg_tpu.runtime.checkpoint import export_generator
    from sid_lsg_tpu.training.loop import TrainConfig, Trainer, training_loop

    n_dev = jax.device_count()
    base = dict(model="tiny", batch_size=n_dev, microbatch=n_dev,
                use_bf16=False, adv_weight_D=0.1, adv_weight_G=0.01,
                adv_tower="dino", adv_vit="tiny", seed=3, max_ticks=1,
                kimg_per_tick=0, snapshot_ticks=0, state_dump_ticks=0,
                sample_ticks=0)
    donor = Trainer(TrainConfig(run_dir=str(tmp_path), **base))
    snap = str(tmp_path / "gen.safetensors")
    export_generator(donor.state.ema, snap)
    del donor

    cfg = TrainConfig(run_dir=str(tmp_path / "resumed"), resume=snap, **base)
    os.makedirs(cfg.run_dir, exist_ok=True)
    state = training_loop(cfg)
    assert set(state.params_fake) == {"psi", "disc"}
    assert any(k.startswith("head_") for k in state.params_fake["disc"])
    assert int(state.step) >= 1


def test_latent_dataset_roundtrip(tmp_path):
    from sid_lsg_tpu.data.latents import InfiniteLatentIterator, LatentDataset

    path = str(tmp_path / "latents.npz")
    lat = np.random.RandomState(0).randn(10, 8, 8, 4).astype(np.float16)
    caps = np.array([f"caption {i}" for i in range(10)])
    np.savez(path, latents=lat, captions=caps)
    ds = LatentDataset(path)
    assert len(ds) == 10
    x, c = ds[3]
    assert x.shape == (8, 8, 4) and x.dtype == np.float32 and c == "caption 3"
    # Striding: two processes see disjoint items, batches cycle forever.
    seen = set()
    for pi in range(2):
        it = InfiniteLatentIterator(ds, batch_size=4, seed=1,
                                    process_index=pi, process_count=2)
        batch, caps_b = next(it)
        assert batch.shape == (4, 8, 8, 4) and len(caps_b) == 4
        seen.update(caps_b)
    assert len(seen) == 8  # disjoint across processes within the epoch

    bad = str(tmp_path / "bad.npz")
    np.savez(bad, foo=np.zeros(3))
    with pytest.raises(ValueError, match="encode_latents"):
        LatentDataset(bad)


def test_encode_latents_cli(tmp_path):
    from click.testing import CliRunner
    from PIL import Image

    from sid_lsg_tpu.cli.encode_latents import main as encode_main
    from sid_lsg_tpu.data.latents import LatentDataset

    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):  # 3 images, batch 2 -> exercises the padded tail chunk
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(
            src / f"{i:08d}.png")
        (src / f"{i:08d}.txt").write_text(f"a photo number {i}")
    dest = str(tmp_path / "out" / "latents.npz")
    res = CliRunner().invoke(encode_main, [
        "--source", str(src), "--dest", dest, "--repo_id", "tiny",
        "--batch", "2", "--use_bf16", "0",
    ])
    assert res.exit_code == 0, res.output
    ds = LatentDataset(dest)
    assert len(ds) == 3
    x, c = ds[0]
    assert x.shape == (8, 8, 4) and c == "a photo number 0"
    assert np.all(np.isfinite(x))
