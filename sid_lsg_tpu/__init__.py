"""SiD-LSG-TPU: TPU-native Score identity Distillation with Long-Short Guidance.

A ground-up JAX/Flax/Pallas/pjit framework with the capabilities of the
reference SiD-LSG codebase (mingyuanzhou/SiD-LSG): data-free distillation of
Stable Diffusion teachers (SD1.5 / SD2.1-base) into one-step text-to-image
generators, plus the surrounding runtime (distributed init, stats, checkpoints,
metrics, datasets, CLIs).

Layer map (cf. reference SURVEY.md §1):
  cli/        -- sid_train / generate_onestep / generate_hpsv2 entry points
  training/   -- distillation loop + the single jitted train step
  diffusion/  -- DDPM scheduler math, SiD sampler / LSG denoiser (pure jnp)
  models/     -- Flax UNet2DCondition, AutoencoderKL, CLIP text/vision,
                 InceptionV3 (FID), tokenizer, torch->flax converters
  ops/        -- Pallas TPU kernels + jnp reference impls behind a registry
  parallel/   -- mesh construction, sharding rules, collectives helpers
  metrics/    -- FID / CLIP-score / precision-recall / HPSv2, registry+cache
  data/       -- prompt corpus, MS-COCO eval set, dataset prep tools
  runtime/    -- distributed init, checkpointing (orbax + pickle interop),
                 profiling
  utils/      -- EasyDict, logging, training_stats, misc
"""

__version__ = "0.1.0"
