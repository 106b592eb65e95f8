"""Headline bench: one-step 512x512 text-to-image throughput per chip.

Measures the production inference path of the distilled generator — one UNet
denoising forward (eps -> x0, the `sid_sampler` eval branch,
reference sid_sd_util.py:187-196) plus the full VAE decode to pixels — in
bf16 under jit on whatever accelerator is visible (the driver runs this on
one real TPU chip).

The reference publishes no throughput numbers (BASELINE.md); ``vs_baseline``
is computed against a documented estimate of the reference pipeline on one
A100-80GB (torch fp16 + xformers, batch 16: ~12 img/s for UNet fwd + VAE
decode at 512px).  Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_A100_IMG_PER_SEC = 12.0  # documented estimate, see module docstring
BATCH = 8
ITERS = 10


def _zeros_params(module, *args):
    shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args))
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)["params"]


def main():
    from sid_lsg_tpu.runtime.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    from sid_lsg_tpu import models
    from sid_lsg_tpu.diffusion import DDPMScheduler

    sd = models.SD15
    unet = models.UNet2DCondition(sd.unet, dtype=jnp.bfloat16)
    vae = models.AutoencoderKL(sd.vae, dtype=jnp.bfloat16)
    scheduler = DDPMScheduler()

    latents = jnp.zeros((BATCH, 64, 64, 4), jnp.float32)
    timesteps = jnp.full((BATCH,), 625, jnp.int32)
    emb = jnp.zeros((BATCH, 77, sd.unet.cross_attention_dim), jnp.float32)
    unet_params = _zeros_params(unet, latents, timesteps, emb)
    vae_params = _zeros_params(vae, jnp.zeros((1, 512, 512, 3)))

    @jax.jit
    def onestep(unet_params, vae_params, latents, timesteps, emb):
        eps = unet.apply({"params": unet_params}, latents, timesteps, emb)
        x0 = scheduler.pred_original_sample(eps.astype(jnp.float32), timesteps, latents)
        images = vae.apply(
            {"params": vae_params}, x0 / sd.vae.scaling_factor, method=vae.decode
        )
        # [-1,1] -> uint8, the PNG-ready tensor (device-side, one transfer).
        return jnp.clip((images.astype(jnp.float32) + 1.0) * 127.5, 0, 255).astype(jnp.uint8)

    out = onestep(unet_params, vae_params, latents, timesteps, emb)
    jax.block_until_ready(out)  # warmup / compile

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = onestep(unet_params, vae_params, latents, timesteps, emb)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    img_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "onestep_512px_images_per_sec_per_chip",
        "value": round(img_per_sec, 3),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / BASELINE_A100_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
