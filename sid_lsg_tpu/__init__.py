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

# Lazy submodule/symbol access: `sid_lsg_tpu.SDPipeline` etc. without paying
# jax/flax import costs for tooling that only needs __version__.
_LAZY = {
    "SDPipeline": ("sid_lsg_tpu.pipeline", "SDPipeline"),
    "pipeline": ("sid_lsg_tpu.pipeline", None),
    "models": ("sid_lsg_tpu.models", None),
    "diffusion": ("sid_lsg_tpu.diffusion", None),
    "training": ("sid_lsg_tpu.training", None),
    "parallel": ("sid_lsg_tpu.parallel", None),
    "metrics": ("sid_lsg_tpu.metrics", None),
    "data": ("sid_lsg_tpu.data", None),
    "runtime": ("sid_lsg_tpu.runtime", None),
    "ops": ("sid_lsg_tpu.ops", None),
    "native": ("sid_lsg_tpu.native", None),
    "utils": ("sid_lsg_tpu.utils", None),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module_name, attr = _LAZY[name]
        module = importlib.import_module(module_name)
        return getattr(module, attr) if attr else module
    raise AttributeError(f"module 'sid_lsg_tpu' has no attribute {name!r}")
