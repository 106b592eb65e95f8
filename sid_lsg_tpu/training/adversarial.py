"""SiDA-style adversarial terms for the SiD-LSG distillation step.

The reference *announces* this integration as its roadmap — building on SiDA
(arXiv 2410.14919) and Diffusion-GAN (arXiv 2206.02262) "without introducing
any additional model parameters" (``/root/reference/README.md:12``) — but
ships no implementation: its bundled projected StyleGAN-T discriminator
(``networks/discriminator.py``) is never touched by the training loop.  This
module wires the announced design the TPU-native way:

- **Discriminator = the fake-score net's encoder.**  The psi UNet is applied
  with ``encoder_only=True`` (conv_in + down path + mid block,
  ``models/unet.py``) and the bottleneck feature map is mean-pooled into one
  logit per image.  No parameters exist beyond psi itself, honouring the
  announced constraint; the denoising loss and the adversarial loss share
  (and jointly train) the encoder tower — the SiDA weight-sharing scheme.
- **Discrimination at every noise level** (the Diffusion-GAN ingredient):
  real and generated latents are compared after being noised with the same
  scheduler and the same timestep draw the denoising loss uses, so the
  discriminator learns to separate real from fake along the whole forward
  diffusion chain rather than only at t=0.
- **Losses** are per-sample arrays so the caller can apply the same
  NaN-row-masking and global-batch normalisation as the SiD terms
  (``distill.py``).  Non-saturating logistic by default; hinge optional.

Everything here is pure jnp and trace-safe: the choice of loss is static,
and no data-dependent control flow exists.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


# encode(params, noisy_latents, timesteps, encoder_hidden_states) -> features
EncoderApply = Callable[..., jnp.ndarray]


def pooled_logit(features: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w, C) bottleneck features -> (B,) scalar logits.

    Global mean pooling: the zero-parameter readout (README.md:12 constraint).
    Computed in f32 so bf16 feature maps do not saturate the pooled sum.
    """
    return jnp.mean(features.astype(jnp.float32), axis=(1, 2, 3))


def _softplus(x: jnp.ndarray) -> jnp.ndarray:
    # Numerically-stable softplus(x) = log(1 + e^x); jnp.logaddexp fuses fine.
    return jnp.logaddexp(x, 0.0)


def d_loss_real(logit_real: jnp.ndarray, kind: str = "ns") -> jnp.ndarray:
    """Real-side per-sample discriminator term: push ``logit_real`` up."""
    if kind == "ns":
        return _softplus(-logit_real)
    if kind == "hinge":
        return jnp.maximum(0.0, 1.0 - logit_real)
    raise ValueError(f"unknown gan loss kind: {kind!r}")


def d_loss_fake(logit_fake: jnp.ndarray, kind: str = "ns") -> jnp.ndarray:
    """Fake-side per-sample discriminator term: push ``logit_fake`` down."""
    if kind == "ns":
        return _softplus(logit_fake)
    if kind == "hinge":
        return jnp.maximum(0.0, 1.0 + logit_fake)
    raise ValueError(f"unknown gan loss kind: {kind!r}")


def d_loss(logit_real: jnp.ndarray, logit_fake: jnp.ndarray,
           kind: str = "ns") -> jnp.ndarray:
    """Per-sample discriminator loss: push ``logit_real`` up, ``logit_fake``
    down.  ``kind`` is static: 'ns' (non-saturating logistic) or 'hinge'.
    Exposed split (``d_loss_real``/``d_loss_fake``) so the caller can mask
    each side by its OWN row validity (real and generated batches carry
    independent NaN-row masks in ``distill.py``)."""
    return d_loss_real(logit_real, kind) + d_loss_fake(logit_fake, kind)


def g_loss(logit_fake: jnp.ndarray, kind: str = "ns") -> jnp.ndarray:
    """Per-sample generator adversarial loss: make fakes score high."""
    if kind == "ns":
        return _softplus(-logit_fake)
    if kind == "hinge":
        return -logit_fake
    raise ValueError(f"unknown gan loss kind: {kind!r}")


def make_pixel_disc(vae, disc, scaling_factor: float):
    """The pixel-space judge for ``adv_tower='dino'``, shared by the Trainer,
    the bench script and the tests (ONE definition of the judging convention).

    Returns ``(pixel_disc, decode_params)``:

    - ``pixel_disc(disc_params, frozen, latents, emb, rng) -> (B, K) logits``
      — VAE-decode the latents to pixels, judge with the projected
      discriminator (frozen DINO backbone + trainable spectral heads),
      conditioned on the mean-pooled caption embedding; ``rng`` drives
      DiffAugment.
    - ``decode_params(vae_params)`` — the decode-only VAE subtree
      (decoder + post_quant_conv); the encoder half would otherwise ride
      replicated on every chip for nothing.
    """

    def decode_params(vae_params):
        return {k: vae_params[k] for k in ("decoder", "post_quant_conv")}

    def pixel_disc(disc_params, frozen, latents, emb, rng):
        img = vae.apply({"params": frozen["vae"]}, latents / scaling_factor,
                        method=vae.decode)
        x_nchw = jnp.transpose(img.astype(jnp.float32), (0, 3, 1, 2))
        c = jnp.mean(emb.astype(jnp.float32), axis=1)  # pooled caption
        return disc.apply(
            {"params": {**disc_params, "dino": frozen["dino"]},
             "spectral": frozen["spectral"]},
            x_nchw, c, rng=rng,
        )

    return pixel_disc, decode_params
