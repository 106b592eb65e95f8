"""SDPipeline: the model bundle every entry point shares.

Plays the role of the reference's ``load_sd15`` + ad-hoc pipeline assembly
(``training/sid_sd_util.py:51-118``, ``generate_onestep.py:250-266``):
tokenizer + CLIP text encoder + UNet + VAE + scheduler as one object holding
Flax param pytrees.  All compute methods are jitted with static shapes and
cached per (batch, steps) signature; prompt encoding happens once per batch
(the text tower is frozen).

Loading:
- ``from_pretrained(dir)`` — an HF-layout SD checkpoint directory
  (unet/ vae/ text_encoder/ tokenizer/ subfolders, safetensors or torch
  pickles) converted to Flax pytrees via ``models.convert``.
- ``random_init(preset)`` — any config preset with fresh params (tests,
  offline smoke, benchmarking).
- ``load_generator(path)`` — swap in distilled one-step generator params from
  an exported checkpoint (orbax/safetensors) or the reference's
  ``network-snapshot-*.pkl`` (``{'ema': torch UNet}``) via torch-cpu interop.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .diffusion.ddpm import DDPMScheduler, SchedulerConfig
from .diffusion.sampling import sid_sampler
from .models import (
    AutoencoderKL,
    CLIPTextModel,
    UNet2DCondition,
    load_tokenizer,
)
from .models.configs import PRESETS, SDConfig, resolve


class SDPipeline:
    def __init__(
        self,
        config: SDConfig,
        params: Dict[str, dict],
        tokenizer,
        dtype=jnp.float32,
        prediction_type: Optional[str] = None,
    ):
        self.config = config
        self.params = params  # {'unet','vae','text'} (+ 'generator' when distilled)
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.scheduler = DDPMScheduler(
            SchedulerConfig.sd(prediction_type or config.prediction_type)
        )
        self.unet = UNet2DCondition(config.unet, dtype=dtype)
        self.vae = AutoencoderKL(config.vae, dtype=dtype)
        self.text_model = CLIPTextModel(config.text, dtype=dtype)
        self._jit_cache: dict = {}
        self._uncond: Optional[jnp.ndarray] = None

    # ------------------------------------------------------------------ load
    @classmethod
    def from_pretrained(
        cls, model_dir: str, dtype=jnp.float32, prediction_type: Optional[str] = None
    ) -> "SDPipeline":
        """Load an HF-layout checkpoint dir, or a preset / ``random:`` spec.

        Random initialisation happens ONLY for a known preset name
        (``tiny``/``sd15``/``sd21base``) or an explicit ``random:<name>``
        prefix; any other non-directory argument raises, so a typo'd
        checkpoint path cannot silently train against a random teacher.
        """
        from .models.convert import load_sd_checkpoint

        if model_dir in PRESETS:
            return cls.random_init(model_dir, dtype=dtype)
        if model_dir.startswith("random:"):
            return cls.random_init(model_dir[len("random:"):], dtype=dtype)
        if not os.path.isdir(model_dir):
            raise FileNotFoundError(
                f"model {model_dir!r} is not a local checkpoint directory. Pass an "
                f"HF-layout SD directory (unet/ vae/ text_encoder/ tokenizer/), a "
                f"preset name {sorted(PRESETS)}, or 'random:<preset-or-repo>' for "
                f"explicit random initialisation (no weights are downloaded)."
            )
        cfg = _sniff_config(model_dir)
        unet_p, vae_p, text_p = load_sd_checkpoint(model_dir, cfg)
        tok = load_tokenizer(model_dir)
        return cls(
            cfg,
            {"unet": unet_p, "vae": vae_p, "text": text_p},
            tok,
            dtype=dtype,
            prediction_type=prediction_type,
        )

    @classmethod
    def random_init(
        cls, preset: str = "tiny", dtype=jnp.float32, seed: int = 0
    ) -> "SDPipeline":
        cfg = resolve(preset)
        rng = jax.random.PRNGKey(seed)
        r1, r2, r3 = jax.random.split(rng, 3)
        s = cfg.unet.sample_size
        unet = UNet2DCondition(cfg.unet)
        vae = AutoencoderKL(cfg.vae)
        text = CLIPTextModel(cfg.text)
        unet_p = unet.init(
            r1,
            jnp.zeros((1, s, s, cfg.unet.in_channels)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, cfg.text.max_position_embeddings, cfg.unet.cross_attention_dim)),
        )["params"]
        vae_p = vae.init(r2, jnp.zeros((1, cfg.resolution, cfg.resolution, 3)))["params"]
        text_p = text.init(r3, jnp.zeros((1, cfg.text.max_position_embeddings), jnp.int32))[
            "params"
        ]
        from .models.tokenizer import HashTokenizer

        tok = HashTokenizer(vocab_size=cfg.text.vocab_size)
        return cls(cfg, {"unet": unet_p, "vae": vae_p, "text": text_p}, tok, dtype=dtype)

    def load_generator(self, path: str) -> None:
        """Install distilled generator params (replaces the UNet for sampling).

        Accepts: a reference ``network-snapshot-*.pkl`` (``{'ema': torch
        module}``, sid_training_loop.py:641-651), a raw torch state-dict file,
        or an orbax/safetensors export from this framework.
        """
        from .runtime.checkpoint import load_generator_params

        self.params = dict(self.params)
        self.params["generator"] = load_generator_params(path, self.config.unet)

    @property
    def generator_params(self) -> dict:
        return self.params.get("generator", self.params["unet"])

    # --------------------------------------------------------------- compute
    def _jit(self, name: str, fn, *static):
        key = (name,) + static
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def encode_prompts(self, prompts: Sequence[str]) -> jnp.ndarray:
        """(B, 77, D) final-hidden-state embeddings (frozen text tower)."""
        ids = jnp.asarray(self.tokenizer(list(prompts)))
        fn = self._jit(
            "text", lambda p, i: self.text_model.apply({"params": p}, i)
        )
        return fn(self.params["text"], ids)

    def uncond_embedding(self) -> jnp.ndarray:
        """(77, D) embedding of the empty prompt, computed once."""
        if self._uncond is None:
            self._uncond = self.encode_prompts([""])[0]
        return self._uncond

    def generate_latents(
        self,
        latents: jnp.ndarray,
        text_embeddings: jnp.ndarray,
        num_steps: int = 1,
        init_timestep: int = 625,
        rng: Optional[jax.Array] = None,
        params: Optional[dict] = None,
    ) -> jnp.ndarray:
        """Eval-branch sampler: noise latents -> x0 latents (f32, NHWC)."""
        params = params if params is not None else self.generator_params
        if num_steps > 1 and rng is None:
            rng = jax.random.PRNGKey(0)

        def fn(p, z, emb, rng):
            apply = lambda x, t, c: self.unet.apply({"params": p}, x, t, c)
            init_t = jnp.full((z.shape[0],), init_timestep, jnp.int32)
            return sid_sampler(
                apply, z, emb, init_t, self.scheduler,
                num_steps=num_steps, rng=rng, dtype=self.dtype,
            )

        jfn = self._jit("gen", fn, num_steps, init_timestep, latents.shape)
        return jfn(params, latents, text_embeddings, rng)

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """x0 latents -> uint8 images (B, H, W, 3).  GroupNorm/attention inside
        the decoder already run f32 (no fp16 upcast dance needed,
        cf. reference upcast_vae sid_sd_util.py:30-48)."""

        def fn(p, z):
            img = self.vae.apply(
                {"params": p}, z / self.config.vae.scaling_factor, method=self.vae.decode
            )
            # uint8 mapping matches the reference exactly: x*127.5 + 128
            # (generate_onestep.py:300) so produced PNGs are bit-comparable.
            return jnp.clip(
                img.astype(jnp.float32) * 127.5 + 128.0, 0, 255
            ).astype(jnp.uint8)

        jfn = self._jit("decode", fn, latents.shape)
        return jfn(self.params["vae"], latents)

    def generate(
        self,
        prompts: Sequence[str],
        latents: jnp.ndarray,
        num_steps: int = 1,
        init_timestep: int = 625,
        rng: Optional[jax.Array] = None,
        as_numpy: bool = True,
    ) -> np.ndarray:
        """prompts + seeded latents -> uint8 images; the one-step product path.

        ``as_numpy=False`` returns the on-device uint8 array WITHOUT blocking
        on readback, so callers can overlap host work (PNG encode) with the
        device computing the next batch (generate_onestep double-buffers on
        this; the reference loop is serial, generate_onestep.py:277-310).
        """
        emb = self.encode_prompts(prompts)
        x0 = self.generate_latents(
            latents, emb, num_steps=num_steps, init_timestep=init_timestep, rng=rng
        )
        out = self.decode(x0)
        return np.asarray(out) if as_numpy else out


def _sniff_config(model_dir: str) -> SDConfig:
    """Build the architecture from the checkpoint's own config jsons (the
    reference's contract, sid_sd_util.py:58-79); checkpoints without an
    ``unet/config.json`` fall back to SD1.5 (the published default)."""
    from .models.configs import config_from_hf_json

    try:
        return config_from_hf_json(model_dir)
    except FileNotFoundError:
        return resolve("sd15")
