"""The SiD-LSG distillation step as ONE jitted function.

TPU-native redesign of the reference's hot loop
(``training/sid_training_loop.py:383-565``): per iteration the reference runs
two python phases — (a) fake-score psi update with a denoising loss on
generator samples, (b) generator theta update with the score-identity loss —
each with gradient accumulation, NaN row-masking, grad nan_to_num, Adam, then
an EMA lerp.  Here all of it is a single ``train_step(state, teacher, batch,
rng) -> (state, metrics)``:

- gradient accumulation is a ``lax.scan`` over microbatches (the reference's
  ``num_accumulation_rounds`` + ``ddp_sync`` no_sync dance,
  ``sid_training_loop.py:245-250,416,487``),
- NaN row-masking is branch-free ``jnp.where`` double-masking
  (``:423-436,508-520``),
- the per-sample python ``scheduler.step`` loop of the reference
  (``sid_sd_util.py:270``) is vectorised inside ``sid_denoise``,
- CFG batch-doubling keeps one large UNet matmul stream (``sid_sd_util.py:
  258-265``) — resolved at trace time, so kappa==1 never pays for it,
- data/FSDP parallelism is carried by the mesh shardings of the inputs; XLA
  inserts all gradient collectives (no DDP object exists),
- the reference's ANNOUNCED SiDA adversarial integration (README.md:12, not
  built there) is available behind ``adv_weight_D``/``adv_weight_G``
  (``training/adversarial.py``): psi's encoder doubles as the discriminator
  on noised real-vs-generated latents, and theta receives a non-saturating
  generator term — zero extra parameters, zero cost when disabled (the
  branches are static).

Per accumulation round with all kappas != 1 this traces 8 UNet forwards and
backprops through 5 of them (sampler + fake/teacher denoise pairs) — the same
compute budget documented in SURVEY.md §3.1.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..diffusion.ddpm import DDPMScheduler
from ..diffusion.sampling import sid_denoise, sid_sampler
from .state import SiDState

# unet_apply(params, latents_nhwc, timesteps, encoder_hidden_states) -> eps/v
UNetApplyP = Callable[[Any, jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    """Knobs of the distillation step; defaults = reference paper config
    (``sid_train.py:96-133``, BASELINE.md)."""

    latent_size: int = 64  # resolution // 8
    latent_channels: int = 4
    init_timestep: int = 625
    tmin: int = 20
    tmax: int = 980
    cfg_train_fake: float = 1.0  # kappa1
    cfg_eval_fake: float = 1.0  # kappa2 = kappa3
    cfg_eval_real: float = 1.0  # kappa4
    alpha: float = 1.0
    loss_scaling: float = 1.0
    loss_scaling_G: float = 1.0
    num_steps: int = 1  # multistep generator (sid_sd_util.py:176-185)
    batch_size: int = 512  # GLOBAL batch per iteration (EMA/nimg bookkeeping)
    ema_halflife_kimg: float = 500.0
    ema_rampup_ratio: Optional[float] = 0.05
    context_dropout: float = 0.1
    dtype: Any = jnp.float32  # activation/compute dtype (bf16 on TPU)
    # SiDA-style adversarial terms (training/adversarial.py; the reference's
    # announced-but-unbuilt roadmap, README.md:12).  Both 0.0 = plain SiD-LSG
    # (the published algorithm); >0 requires `unet_encode` in make_train_step
    # and `lat_real`/`emb_real` batch entries.
    adv_weight_D: float = 0.0
    adv_weight_G: float = 0.0
    gan_loss: str = "ns"  # 'ns' | 'hinge'
    # Discriminator tower: 'encoder' = psi's encoder on noised latents (the
    # announced zero-extra-parameter SiDA design); 'dino' = the projected
    # StyleGAN-T discriminator on VAE-DECODED pixels (frozen DINO features,
    # trainable spectral heads — reference networks/discriminator.py, shipped
    # there but never wired into any loop).  'dino' requires `pixel_disc` in
    # make_train_step, a `disc_frozen` batch entry, and params_fake shaped
    # {'psi': ..., 'disc': ...}.
    adv_tower: str = "encoder"  # 'encoder' | 'dino'

    @property
    def use_context_dropout_fake(self) -> bool:
        # Reference flag logic at sid_training_loop.py:208-212.
        return self.cfg_train_fake != 1.0 or self.cfg_eval_fake != 1.0

    @property
    def adversarial(self) -> bool:
        return self.adv_weight_D > 0.0 or self.adv_weight_G > 0.0


def ema_beta(cfg: DistillConfig, nimg: jnp.ndarray) -> jnp.ndarray:
    """EMA decay with ramp-up (reference sid_training_loop.py:553-565)."""
    halflife_nimg = jnp.asarray(cfg.ema_halflife_kimg * 1000.0, jnp.float32)
    if cfg.ema_rampup_ratio is not None:
        halflife_nimg = jnp.minimum(halflife_nimg, nimg * cfg.ema_rampup_ratio)
    return 0.5 ** (cfg.batch_size / jnp.maximum(halflife_nimg, 1e-8))


def _per_sample_finite(x: jnp.ndarray) -> jnp.ndarray:
    """(B, ...) -> (B,) bool: every element finite."""
    return jnp.all(jnp.isfinite(x.reshape(x.shape[0], -1)), axis=-1)


def _mask_rows(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Zero invalid rows so they contribute neither loss nor gradient."""
    return jnp.where(valid.reshape((-1,) + (1,) * (x.ndim - 1)), x, 0.0)


def _masked_mean(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """(B,) mean over valid rows only (0 when none) — keeps diagnostics like
    the D-logit means unpolluted by zeroed NaN rows."""
    return jnp.sum(jnp.where(valid, x, 0.0)) / jnp.maximum(jnp.sum(valid), 1)


def make_loss_fns(
    unet_apply: UNetApplyP,
    scheduler: DDPMScheduler,
    cfg: DistillConfig,
    fake_transform: Optional[Callable[[Any, Any], Any]] = None,
    unet_encode: Optional[UNetApplyP] = None,
    mesh=None,
    pixel_disc: Optional[Callable[..., jnp.ndarray]] = None,
):
    """Build the per-round loss functions of both phases as pure callables.

    This is the single source of truth for the SiD-LSG math — ``make_train_step``
    composes these with RNG draws, gradient accumulation and the optimizers.
    Exposed publicly so the composed-step cross-implementation gate
    (``tests/test_composed_step_gate.py``) can feed EXPLICIT z/noise/t/embedding
    tensors into the exact code the production step runs and compare losses and
    gradients against an independent torch reimplementation of the reference
    algorithm (``training/sid_training_loop.py:383-549`` +
    ``training/sid_sd_util.py:163-274``).

    Returns a namespace with:
      - ``psi_loss(params_fake, teacher, images, noise, emb, uncond_b, t,
        extra, frozen, rng_adv, denom) -> (loss, aux)``
      - ``g_loss(params_g, params_fake, teacher, z, noise, emb, uncond_b, t,
        init_t, rng, frozen, rng_adv, denom) -> (loss, aux)``
      - ``generate/denoise/draw`` building blocks and the aux-zero trees.
    """
    import types

    fake_transform = fake_transform or (lambda pf, teacher: pf)
    if cfg.adv_tower not in ("encoder", "dino"):
        raise ValueError(f"unknown adv_tower: {cfg.adv_tower!r}")
    pixel_mode = cfg.adversarial and cfg.adv_tower == "dino"
    if cfg.adversarial and not pixel_mode and unet_encode is None:
        raise ValueError(
            "adv_weight_D/adv_weight_G > 0 with adv_tower='encoder' requires "
            "unet_encode (encoder-only UNet apply for the SiDA discriminator)"
        )
    if pixel_mode and pixel_disc is None:
        raise ValueError("adv_tower='dino' requires pixel_disc")
    # params_fake is {'psi': ..., 'disc': ...} in pixel mode (one optimizer
    # updates both in the psi phase); plain psi otherwise.
    psi_of = (lambda pf: pf["psi"]) if pixel_mode else (lambda pf: pf)
    disc_of = (lambda pf: pf["disc"]) if pixel_mode else (lambda pf: None)
    from . import adversarial
    from ..parallel.mesh import activation_constraint
    v_pred = scheduler.config.prediction_type == "v_prediction"
    lat_shape_of = lambda mb: (mb, cfg.latent_size, cfg.latent_size, cfg.latent_channels)
    _pin = lambda x: activation_constraint(x, mesh)

    def _draw(rng: jax.Array, mb: int):
        r_z, r_n, r_t = jax.random.split(rng, 3)
        z = _pin(jax.random.normal(r_z, lat_shape_of(mb), jnp.float32))
        noise = _pin(jax.random.normal(r_n, lat_shape_of(mb), jnp.float32))
        t = _pin(jax.random.randint(r_t, (mb,), cfg.tmin, cfg.tmax, jnp.int32))
        init_t = jnp.full((mb,), cfg.init_timestep, jnp.int32)
        return z, noise, t, init_t

    def _generate(params_g, z, emb, init_t, rng):
        apply = lambda x, t, c: unet_apply(params_g, x, t, c)
        return _pin(sid_sampler(
            apply, z, emb, init_t, scheduler,
            num_steps=cfg.num_steps, rng=rng, dtype=cfg.dtype,
        ))

    def _denoise(params, images, noise, emb, uncond_b, t, scale, predict_x0):
        apply = lambda x, tt, c: unet_apply(params, x, tt, c)
        return _pin(sid_denoise(
            apply, images, noise, emb,
            uncond_b if scale != 1.0 else None, t, scheduler,
            guidance_scale=scale, predict_x0=predict_x0, dtype=cfg.dtype,
        ))

    def _disc_logit(params_eff, latents, noise, emb, t):
        """SiDA discriminator readout: pooled encoder features of the noised
        latents (training/adversarial.py).  Same schedule/timestep draw as the
        denoising losses, so D sees every noise level (Diffusion-GAN)."""
        x_t = scheduler.add_noise(latents, noise, t)
        x_in = scheduler.scale_model_input(x_t, t)
        feats = unet_encode(params_eff, x_in.astype(cfg.dtype), t, emb)
        return adversarial.pooled_logit(feats)

    def _d_logits(params_fake, eff, latents, noise, emb, t, frozen, rng):
        """Discriminator logits for one side (real or generated), per tower."""
        if pixel_mode:
            return pixel_disc(disc_of(params_fake), frozen, latents, emb, rng)
        return _disc_logit(eff, latents, noise, emb, t)

    def _per_sample(d: jnp.ndarray) -> jnp.ndarray:
        """(B,) or (B, K) per-logit losses -> (B,) (projected D emits one
        logit per head; average them so gan weights stay tower-comparable)."""
        return d if d.ndim == 1 else jnp.mean(d, axis=tuple(range(1, d.ndim)))

    # ---------------- psi (fake score) phase -------------------------------
    def psi_loss(params_fake, teacher, images, noise, emb, uncond_b, t,
                 extra, frozen, rng_adv, denom):
        # Sanitize UNet INPUTS per-row before tracing them into the graph:
        # a NaN activation inside the net poisons whole weight-gradient
        # tensors in the backward pass (0-cotangent x NaN-activation = NaN).
        # The reference has the same IEEE failure mode — its row filtering
        # (sid_training_loop.py:423-436) zeroes only the dropped rows'
        # cotangents, so every parameter downstream of the NaN origin still
        # gets a NaN gradient that nan_to_num (:458-460) wipes to zero,
        # losing the valid rows' contribution.  Zeroing invalid input rows
        # up front is strictly stronger: the row is excluded by `valid`
        # below, every activation stays finite, and valid rows' gradients
        # survive in full.  (NaN born INSIDE the net from finite inputs
        # still falls back to nan_to_num_grads.)  Loss values match the
        # reference exactly either way; gated by test_composed_step_gate.py.
        valid_in = _per_sample_finite(images) & _per_sample_finite(noise)
        images = _mask_rows(images, valid_in)
        noise = _mask_rows(noise, valid_in)
        eff = fake_transform(psi_of(params_fake), teacher)
        noise_fake = _denoise(
            eff, images, noise, emb, uncond_b, t,
            cfg.cfg_train_fake, predict_x0=False,
        )
        valid = valid_in & _per_sample_finite(noise_fake)
        if v_pred:
            target = scheduler.get_velocity(images, noise, t)
            valid = valid & _per_sample_finite(target)
        else:
            target = noise
        diff = _mask_rows(noise_fake, valid) - _mask_rows(target, valid)
        per = jnp.sum(jnp.square(diff), axis=(1, 2, 3))
        if v_pred:
            snr = scheduler.snr(t)
            per = per * snr / (snr + 1.0)
        loss = jnp.sum(per) * (cfg.loss_scaling / denom)
        aux = {"n_valid": jnp.sum(valid), "loss": loss}
        total = loss
        if cfg.adv_weight_D > 0.0:
            r_fake, r_real = jax.random.split(rng_adv)
            # The real-side batch (mmap'd encode_latents rows) carries its
            # own corruption risk — sanitize it exactly like the generated
            # side, and mask each d-loss side by its OWN row validity so a
            # bad real row cannot NaN-poison psi gradients or train D on a
            # zeroed image.
            valid_real = (_per_sample_finite(extra["lat_real"])
                          & _per_sample_finite(extra["emb_real"]))
            lat_real = _mask_rows(extra["lat_real"], valid_real)
            emb_real = _mask_rows(extra["emb_real"], valid_real)
            noise_real = jax.random.normal(r_real, lat_real.shape, jnp.float32)
            logit_fake = _d_logits(params_fake, eff, images, noise, emb, t,
                                   frozen, r_fake)
            logit_real = _d_logits(params_fake, eff, lat_real,
                                   noise_real, emb_real, t,
                                   frozen, r_real)
            d_fake = _per_sample(adversarial.d_loss_fake(logit_fake, cfg.gan_loss))
            d_real = _per_sample(adversarial.d_loss_real(logit_real, cfg.gan_loss))
            d_fake = jnp.where(valid_in & jnp.isfinite(d_fake), d_fake, 0.0)
            d_real = jnp.where(valid_real & jnp.isfinite(d_real), d_real, 0.0)
            adv = (jnp.sum(d_fake) + jnp.sum(d_real)) * (
                cfg.adv_weight_D * cfg.loss_scaling / denom)
            total = total + adv
            aux.update(
                adv_d_loss=adv,
                d_logit_real=_masked_mean(_per_sample(logit_real), valid_real),
                d_logit_fake=_masked_mean(_per_sample(logit_fake), valid_in),
            )
        return total, aux

    def psi_aux_zero():
        aux = {"n_valid": jnp.zeros((), jnp.int32), "loss": jnp.zeros((), jnp.float32)}
        if cfg.adv_weight_D > 0.0:
            aux.update(
                adv_d_loss=jnp.zeros((), jnp.float32),
                d_logit_real=jnp.zeros((), jnp.float32),
                d_logit_fake=jnp.zeros((), jnp.float32),
            )
        return aux

    # ---------------- theta (generator) phase ------------------------------
    def g_loss(params_g, params_fake, teacher, z, noise, emb, uncond_b, t,
               init_t, rng, frozen, rng_adv, denom):
        # Same input sanitization rationale as psi_loss: keep every traced
        # activation finite so invalid rows cost only their own contribution,
        # not (via backward NaN poisoning + nan_to_num) the whole gradient.
        valid_in = _per_sample_finite(z) & _per_sample_finite(noise)
        z = _mask_rows(z, valid_in)
        noise = _mask_rows(noise, valid_in)
        images = _generate(params_g, z, emb, init_t, rng)
        eff_fake = fake_transform(psi_of(params_fake), teacher)
        y_fake = _denoise(eff_fake, images, noise,
                          emb, uncond_b, t, cfg.cfg_eval_fake, predict_x0=True)
        y_real = _denoise(teacher, images, noise, emb, uncond_b, t,
                          cfg.cfg_eval_real, predict_x0=True)
        valid = (
            valid_in
            & _per_sample_finite(images)
            & _per_sample_finite(y_real)
            & _per_sample_finite(y_fake)
        )
        x = _mask_rows(images, valid)
        y_real = _mask_rows(y_real, valid)
        y_fake = _mask_rows(y_fake, valid)
        w = jax.lax.stop_gradient(
            jnp.clip(jnp.mean(jnp.abs(x - y_real), axis=(1, 2, 3), keepdims=True), 1e-5)
        )
        if cfg.alpha == 1.0:
            per = (y_real - y_fake) * (y_fake - x) / w
        else:
            per = (y_real - y_fake) * ((y_real - x) - cfg.alpha * (y_real - y_fake)) / w
        per = jnp.sum(_mask_rows(per, valid), axis=(1, 2, 3))
        loss = jnp.sum(per) * (cfg.loss_scaling_G / denom)
        aux = {"n_valid": jnp.sum(valid), "loss": loss}
        total = loss
        if cfg.adv_weight_G > 0.0:
            # Gradient reaches theta through `images`; the discriminator is a
            # fixed judge here (its own update happened in the psi phase).
            logit_gen = _d_logits(params_fake, eff_fake, images, noise, emb,
                                  t, frozen, rng_adv)
            g_per = adversarial.g_loss(logit_gen, cfg.gan_loss)
            g_per = _per_sample(g_per)
            g_per = jnp.where(valid & jnp.isfinite(g_per), g_per, 0.0)
            adv = jnp.sum(g_per) * (cfg.adv_weight_G * cfg.loss_scaling_G / denom)
            total = total + adv
            aux["adv_g_loss"] = adv
        return total, aux

    def g_aux_zero():
        aux = {"n_valid": jnp.zeros((), jnp.int32), "loss": jnp.zeros((), jnp.float32)}
        if cfg.adv_weight_G > 0.0:
            aux["adv_g_loss"] = jnp.zeros((), jnp.float32)
        return aux

    return types.SimpleNamespace(
        psi_loss=psi_loss,
        g_loss=g_loss,
        psi_aux_zero=psi_aux_zero,
        g_aux_zero=g_aux_zero,
        draw=_draw,
        generate=_generate,
        denoise=_denoise,
        pixel_mode=pixel_mode,
        psi_of=psi_of,
    )


def make_train_step(
    unet_apply: UNetApplyP,
    scheduler: DDPMScheduler,
    cfg: DistillConfig,
    opt_g: optax.GradientTransformation,
    opt_fake: optax.GradientTransformation,
    fake_transform: Optional[Callable[[Any, Any], Any]] = None,
    unet_encode: Optional[UNetApplyP] = None,
    mesh=None,
    pixel_disc: Optional[Callable[..., jnp.ndarray]] = None,
):
    """Build ``train_step(state, teacher_params, batch, rng)``.

    ``fake_transform(params_fake, teacher_params)`` maps the trainable
    fake-score state to effective UNet params; identity by default, or
    ``lora.apply_lora`` composition when psi is LoRA-parameterised
    (``state.params_fake`` then holds only the factor tree).

    ``unet_encode(params, noisy_latents, t, emb)`` is the encoder-only UNet
    apply (bottleneck features) backing the SiDA discriminator; required iff
    ``cfg.adversarial`` with the default ``adv_tower='encoder'``
    (see ``training/adversarial.py``).

    ``pixel_disc(disc_params, frozen, latents, emb, rng) -> (B, K) logits``
    is the pixel-space projected-discriminator apply (VAE decode + frozen
    DINO features + trainable spectral heads) required iff
    ``cfg.adv_tower == 'dino'``; ``frozen`` arrives as the ``disc_frozen``
    batch entry (replicated — frozen judge weights), ``disc_params`` is
    ``state.params_fake['disc']`` (the trainable heads, updated by the psi
    optimizer in the psi phase), and ``rng`` drives DiffAugment.

    ``mesh`` (optional, >1-device): pins every phase-boundary activation
    (drawn latents, sampler outputs, denoise outputs) to batch sharding via
    ``with_sharding_constraint`` so the SPMD partitioner never falls back to
    involuntary full rematerialization when propagating between the fsdp
    parameter layout and the batch layout.  The constraint transposes to the
    cotangents too, anchoring the backward pass.

    ``batch`` (text already encoded — the text tower is frozen, so encoding
    happens once per batch outside both phases, unlike the reference which
    re-tokenises inside every denoise call):
      - ``emb_fake``: (A, mb, L, D) prompt embeddings for the psi phase
      - ``emb_g``:    (A, mb, L, D) prompt embeddings for the theta phase
      - ``uncond_emb``: (L, D) embedding of the empty prompt
      - ``lat_real``/``emb_real``: (A, mb, h, w, c)/(A, mb, L, D) VAE latents
        of real images and their caption embeddings (adversarial mode only)
    where A = accumulation rounds and mb = global microbatch.
    """
    L = make_loss_fns(
        unet_apply, scheduler, cfg,
        fake_transform=fake_transform, unet_encode=unet_encode,
        mesh=mesh, pixel_disc=pixel_disc,
    )
    pixel_mode = L.pixel_mode
    _draw, _generate = L.draw, L.generate
    _psi_loss, _g_loss = L.psi_loss, L.g_loss
    _psi_aux_zero, _g_aux_zero = L.psi_aux_zero, L.g_aux_zero

    def _dropout_context(rng, emb, uncond_b):
        keep = jax.random.uniform(rng, (emb.shape[0],)) >= cfg.context_dropout
        return jnp.where(keep[:, None, None], emb, uncond_b)

    def _accumulate(grad_fn, params, embs, extras, aux_zero, uncond_b, rng,
                    use_dropout):
        """lax.scan over accumulation rounds, summing normalised grads and the
        aux metric dict.  ``extras`` is a pytree of per-round arrays (leading
        dim A) scanned alongside the embeddings; empty dict when unused."""
        a_rounds = embs.shape[0]

        def one_round(idx, emb, extra):
            r = jax.random.fold_in(rng, idx)
            r_drop, r_draw, r_multi = jax.random.split(r, 3)
            if use_dropout:
                emb = _dropout_context(r_drop, emb, uncond_b)
                if "emb_real" in extra:
                    # Same r_drop -> same rows: the SiDA discriminator must
                    # see identical conditioning-dropout statistics on real
                    # and fake pairs, or "carries the uncond embedding"
                    # becomes a spurious fake marker.
                    extra = dict(extra, emb_real=_dropout_context(
                        r_drop, extra["emb_real"], uncond_b))
            return grad_fn(params, emb, extra, r_draw, r_multi)

        if a_rounds == 1:
            # No accumulation: skip the while-loop entirely.  The scan carry
            # makes XLA materialise an extra full-gradient copy per round
            # (profiled at ~6% of the full-width step) that a straight call
            # avoids; RNG (fold_in(rng, 0)) matches the scan path exactly.
            first = lambda x: x[0]
            return one_round(
                jnp.int32(0),
                embs[0],
                jax.tree_util.tree_map(first, extras),
            )

        zero_grads = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        )

        def body(carry, inp):
            grads_acc, aux_acc = carry
            emb, extra, idx = inp
            grads, aux = one_round(idx, emb, extra)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            aux_acc = jax.tree_util.tree_map(jnp.add, aux_acc, aux)
            return (grads_acc, aux_acc), None

        (grads, aux), _ = jax.lax.scan(
            body,
            (zero_grads, aux_zero),
            (embs, extras, jnp.arange(a_rounds)),
        )
        return grads, aux

    def train_step(
        state: SiDState,
        teacher_params: Any,
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
    ) -> Tuple[SiDState, Dict[str, jnp.ndarray]]:
        emb_fake = batch["emb_fake"]
        emb_g = batch["emb_g"]
        uncond = batch["uncond_emb"]
        a_rounds, mb = emb_fake.shape[0], emb_fake.shape[1]
        denom = float(a_rounds * mb)  # global-batch normalisation (see module doc)
        uncond_b = jnp.broadcast_to(uncond, (mb,) + uncond.shape[-2:])
        rng_fake, rng_g = jax.random.split(jax.random.fold_in(rng, state.step))
        extras_fake = (
            {"lat_real": batch["lat_real"], "emb_real": batch["emb_real"]}
            if cfg.adv_weight_D > 0.0 else {}
        )
        # Frozen pixel-discriminator weights (VAE decoder + DINO backbone +
        # spectral u's) ride as a replicated batch entry — inputs, not
        # trainables, and not per-round data (the scan closes over them).
        frozen = batch.get("disc_frozen") if pixel_mode else None

        # --- psi update (generator frozen: params_G enters via stop_gradient).
        def psi_grad(params_fake, emb, extra, r_draw, r_multi):
            z, noise, t, init_t = _draw(r_draw, mb)
            images = jax.lax.stop_gradient(
                _generate(state.params_G, z, emb, init_t, r_multi)
            )
            r_adv = jax.random.fold_in(r_draw, 1)
            return jax.grad(_psi_loss, has_aux=True)(
                params_fake, teacher_params, images, noise, emb, uncond_b, t,
                extra, frozen, r_adv, denom,
            )

        grads_f, aux_f = _accumulate(
            psi_grad, state.params_fake, emb_fake, extras_fake, _psi_aux_zero(),
            uncond_b, rng_fake, cfg.use_context_dropout_fake,
        )
        upd_f, opt_fake_state = opt_fake.update(grads_f, state.opt_fake, state.params_fake)
        params_fake = optax.apply_updates(state.params_fake, upd_f)

        # --- theta update (uses the freshly updated psi, like the reference).
        def g_grad(params_g, emb, extra, r_draw, r_multi):
            del extra
            z, noise, t, init_t = _draw(r_draw, mb)
            r_adv = jax.random.fold_in(r_draw, 1)
            return jax.grad(_g_loss, has_aux=True)(
                params_g, params_fake, teacher_params, z, noise, emb,
                uncond_b, t, init_t, r_multi, frozen, r_adv, denom,
            )

        grads_g, aux_g = _accumulate(
            g_grad, state.params_G, emb_g, {}, _g_aux_zero(),
            uncond_b, rng_g, use_dropout=False,
        )
        upd_g, opt_g_state = opt_g.update(grads_g, state.opt_G, state.params_G)
        params_g_new = optax.apply_updates(state.params_G, upd_g)

        # --- EMA lerp with halflife ramp (sid_training_loop.py:553-565).
        beta = ema_beta(cfg, state.nimg)
        ema = jax.tree_util.tree_map(
            lambda p, e: p * (1.0 - beta) + e * beta, params_g_new, state.ema
        )

        new_state = SiDState(
            step=state.step + 1,
            nimg=state.nimg + cfg.batch_size,
            params_G=params_g_new,
            params_fake=params_fake,
            ema=ema,
            opt_G=opt_g_state,
            opt_fake=opt_fake_state,
        )
        metrics = {
            "fake_score_loss": aux_f["loss"] / a_rounds,
            "g_loss": aux_g["loss"] / a_rounds,
            "fake_valid": aux_f["n_valid"],
            "g_valid": aux_g["n_valid"],
            "ema_beta": beta,
        }
        if cfg.adv_weight_D > 0.0:
            metrics["adv_d_loss"] = aux_f["adv_d_loss"] / a_rounds
            metrics["d_logit_real"] = aux_f["d_logit_real"] / a_rounds
            metrics["d_logit_fake"] = aux_f["d_logit_fake"] / a_rounds
        if cfg.adv_weight_G > 0.0:
            metrics["adv_g_loss"] = aux_g["adv_g_loss"] / a_rounds
        return new_state, metrics

    return train_step


def jit_train_step(
    train_step,
    mesh=None,
    state=None,
    teacher=None,
    batch=None,
    min_size: int = 2**16,
):
    """jit the step with donated state and, on a >1-device mesh, EXPLICIT
    in/out shardings (reference parity: DDP's fixed placement,
    ``training/sid_training_loop.py:316-323`` — nothing is left for GSPMD to
    infer at the boundary).

    ``state``/``teacher``/``batch`` may be real pytrees or ``ShapeDtypeStruct``
    trees — only tree structure and shapes are read.  Params follow the FSDP
    largest-divisible-axis rule, the batch dict follows ``batch_shardings``
    (microbatch axis over all devices), rng and metrics are replicated, and
    the output state inherits the input state's shardings (required for
    donation to alias buffers).
    """
    if mesh is None or mesh.size <= 1:
        return jax.jit(train_step, donate_argnums=(0,))
    if state is None or teacher is None or batch is None:
        raise ValueError("jit_train_step with a mesh needs state/teacher/batch "
                         "examples (real or abstract) to derive shardings")
    from ..parallel.mesh import (
        batch_shardings, param_shardings, replicated_sharding,
    )

    state_sh = param_shardings(state, mesh, min_size)
    rep = replicated_sharding(mesh)
    in_sh = (
        state_sh,
        param_shardings(teacher, mesh, min_size),
        batch_shardings(batch, mesh),
        rep,
    )
    return jax.jit(
        train_step,
        in_shardings=in_sh,
        out_shardings=(state_sh, rep),
        donate_argnums=(0,),
    )
