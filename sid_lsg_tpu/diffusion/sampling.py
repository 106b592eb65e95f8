"""SiD sampler and LSG denoiser as pure, jit-safe functions.

TPU-native re-design of reference ``training/sid_sd_util.py:163-274``
(``sid_sd_sampler`` / ``sid_sd_denoise``).  Differences by design:

- Text encoding is hoisted out: the text encoder is frozen, so callers encode
  prompts once per batch (and the uncond embedding once per run) instead of
  re-tokenising inside every call like the reference does
  (sid_sd_util.py:170-172,221-240).  These functions take embedding arrays.
- The per-sample python loop over ``scheduler.step`` (sid_sd_util.py:270) is a
  single vectorised ``pred_original_sample``.
- CFG uses the reference's batch-doubling formulation (sid_sd_util.py:258-265):
  one UNet call on ``concat([uncond, cond])`` keeps the MXU fed with one large
  matmul stream instead of two small ones.
- ``guidance_scale`` and ``num_steps`` are static (python) values: the branch
  is resolved at trace time, so a kappa==1 run never pays the doubled batch.

The ``unet_apply`` argument is any callable
``(latents_bhwc, timesteps, encoder_hidden_states) -> model_output`` — e.g. a
bound Flax module with params closed over, letting the same math serve the
generator, the fake score net and the frozen teacher.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .ddpm import DDPMScheduler

UNetApply = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def sid_sampler(
    unet_apply: UNetApply,
    latents: jnp.ndarray,
    text_embeddings: jnp.ndarray,
    init_timesteps: jnp.ndarray,
    scheduler: DDPMScheduler,
    *,
    num_steps: int = 1,
    rng: Optional[jax.Array] = None,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Generator forward: iterative x0-prediction (sid_sd_util.py:176-196).

    Step i re-noises the running x0 estimate ``D_x`` at timestep
    ``floor(init_t * (1 - i/num_steps))`` using the input ``latents`` as the
    noise for step 0 and fresh noise afterwards, then predicts a new x0.
    Train and eval branches of the reference are identical in math (only
    autodiff bookkeeping differs, which JAX handles externally), so there is a
    single implementation.

    Returns the final x0 estimate in float32 (latent space, NHWC).
    """
    assert num_steps >= 1
    if num_steps > 1 and rng is None:
        raise ValueError("rng is required for num_steps > 1 (fresh noise per step)")
    d_x = jnp.zeros_like(latents, dtype=jnp.float32)
    for i in range(num_steps):
        if i == 0:
            noise = latents.astype(jnp.float32)
        else:
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, latents.shape, dtype=jnp.float32)
        t_i = (init_timesteps.astype(jnp.float32) * (1.0 - i / num_steps)).astype(jnp.int32)
        noisy = scheduler.add_noise(d_x, noise, t_i)
        model_in = scheduler.scale_model_input(noisy, t_i)
        model_out = unet_apply(model_in.astype(dtype), t_i, text_embeddings).astype(jnp.float32)
        d_x = scheduler.pred_original_sample(model_out, t_i, noisy)
    return d_x


def sid_denoise(
    unet_apply: UNetApply,
    images: jnp.ndarray,
    noise: jnp.ndarray,
    text_embeddings: jnp.ndarray,
    uncond_embeddings: Optional[jnp.ndarray],
    timesteps: jnp.ndarray,
    scheduler: DDPMScheduler,
    *,
    guidance_scale: float = 1.0,
    predict_x0: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Score-network denoise with classifier-free guidance (the LSG core).

    Matches reference ``sid_sd_denoise`` (sid_sd_util.py:214-274): noise the
    images at ``timesteps``, run the UNet (batch-doubled when kappa != 1), mix
    ``eps = eps_uncond + kappa (eps_text - eps_uncond)``, then either return
    eps or the x0 estimate.
    """
    latents = scheduler.add_noise(images, noise, timesteps)
    if guidance_scale == 1.0:
        model_in = scheduler.scale_model_input(latents, timesteps)
        model_out = unet_apply(model_in.astype(dtype), timesteps, text_embeddings).astype(
            jnp.float32
        )
    else:
        if uncond_embeddings is None:
            raise ValueError("uncond_embeddings required when guidance_scale != 1")
        emb = jnp.concatenate([uncond_embeddings, text_embeddings], axis=0)
        t2 = jnp.concatenate([timesteps, timesteps], axis=0)
        lat2 = jnp.concatenate([latents, latents], axis=0)
        model_in = scheduler.scale_model_input(lat2, t2)
        out2 = unet_apply(model_in.astype(dtype), t2, emb).astype(jnp.float32)
        out_uncond, out_text = jnp.split(out2, 2, axis=0)
        model_out = out_uncond + guidance_scale * (out_text - out_uncond)
    if predict_x0:
        return scheduler.pred_original_sample(model_out, timesteps, latents.astype(jnp.float32))
    return model_out
