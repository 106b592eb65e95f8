"""Decompose the onestep-inference bench: UNet forward vs VAE decode vs
combined, each timed with a hard readback, to localize the regression."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sid_lsg_tpu import models
from sid_lsg_tpu.diffusion import DDPMScheduler
from sid_lsg_tpu.runtime.compile_cache import enable as enable_compile_cache

BATCH = 8


def _zeros_params(module, *args):
    shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args))
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)["params"]


def timed(fn, iters=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    enable_compile_cache()
    sd = models.SD15
    unet = models.UNet2DCondition(sd.unet, dtype=jnp.bfloat16)
    vae = models.AutoencoderKL(sd.vae, dtype=jnp.bfloat16)
    scheduler = DDPMScheduler()

    latents = jnp.zeros((BATCH, 64, 64, 4), jnp.float32)
    timesteps = jnp.full((BATCH,), 625, jnp.int32)
    emb = jnp.zeros((BATCH, 77, sd.unet.cross_attention_dim), jnp.float32)
    unet_params = _zeros_params(unet, latents, timesteps, emb)
    vae_params = _zeros_params(vae, jnp.zeros((1, 512, 512, 3)))

    junet = jax.jit(lambda p, x, t, c: unet.apply({"params": p}, x, t, c))
    jvae = jax.jit(lambda p, z: vae.apply({"params": p}, z, method=vae.decode))

    eps = junet(unet_params, latents, timesteps, emb)
    ms = timed(lambda: float(junet(unet_params, latents, timesteps, emb)[0, 0, 0, 0].astype(jnp.float32)))
    print(json.dumps({"probe": "unet_fwd_ms", "value": round(ms, 1)}), flush=True)

    x0 = scheduler.pred_original_sample(eps.astype(jnp.float32), timesteps, latents)
    z = x0 / sd.vae.scaling_factor
    jvae(vae_params, z)
    ms = timed(lambda: float(jvae(vae_params, z)[0, 0, 0, 0].astype(jnp.float32)))
    print(json.dumps({"probe": "vae_decode_ms", "value": round(ms, 1)}), flush=True)

    # bf16 params variant: does the in-graph f32->bf16 cast of 860M params
    # (3.4 GB of reads) account for the gap?
    unet_bf16 = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), unet_params)
    junet2 = jax.jit(lambda p, x, t, c: unet.apply({"params": p}, x, t, c))
    junet2(unet_bf16, latents, timesteps, emb)
    ms = timed(lambda: float(junet2(unet_bf16, latents, timesteps, emb)[0, 0, 0, 0].astype(jnp.float32)))
    print(json.dumps({"probe": "unet_fwd_bf16params_ms", "value": round(ms, 1)}), flush=True)


if __name__ == "__main__":
    main()
