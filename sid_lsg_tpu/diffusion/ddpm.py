"""DDPM noise-schedule math as pure jnp functions.

Replaces the diffusers ``DDPMScheduler`` the reference loads at
``training/sid_sd_util.py:65`` with a stateless, fully-vectorised, jit-safe
implementation.  Semantics match diffusers in fp32:

- ``betas``: 'scaled_linear' is ``linspace(sqrt(b0), sqrt(b1), N)**2`` (the SD
  schedule: beta_start=0.00085, beta_end=0.012, N=1000).
- ``add_noise``:   ``sqrt(abar_t) x0 + sqrt(1-abar_t) eps``.
- ``pred_original_sample`` (the only output of ``scheduler.step`` the reference
  ever consumes, sid_sd_util.py:185,195,270): closed-form x0 estimate per
  prediction type.  Vectorised over per-sample timesteps — the reference runs a
  python loop over the batch (sid_sd_util.py:270); on TPU this is one gather +
  fused elementwise op.
- ``get_velocity`` / ``compute_snr``: v-prediction support used by the fake
  score loss (sid_training_loop.py:424-441; compute_snr from
  diffusers.training_utils is imported there at line 30).

All schedule tables are precomputed in float64 on host then stored as float32
constants; per-step lookups are gathers, so everything jits with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # 'linear' | 'scaled_linear' | 'squaredcos_cap_v2'
    prediction_type: str = "epsilon"  # 'epsilon' | 'v_prediction' | 'sample'
    steps_offset: int = 1
    clip_sample: bool = False
    clip_sample_range: float = 1.0

    @classmethod
    def sd(cls, prediction_type: str = "epsilon") -> "SchedulerConfig":
        """The Stable-Diffusion schedule (SD1.5 & SD2.1-base scheduler config)."""
        return cls(prediction_type=prediction_type)


def make_betas(config: SchedulerConfig) -> np.ndarray:
    n = config.num_train_timesteps
    if config.beta_schedule == "linear":
        betas = np.linspace(config.beta_start, config.beta_end, n, dtype=np.float64)
    elif config.beta_schedule == "scaled_linear":
        betas = np.linspace(config.beta_start**0.5, config.beta_end**0.5, n, dtype=np.float64) ** 2
    elif config.beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t: float) -> float:
            return float(np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2)
        betas = np.array(
            [min(1 - alpha_bar((i + 1) / n) / alpha_bar(i / n), 0.999) for i in range(n)],
            dtype=np.float64,
        )
    else:
        raise ValueError(f"unknown beta_schedule {config.beta_schedule!r}")
    return betas


class DDPMScheduler:
    """Stateless schedule tables + pure functions.

    Instances hold only constant jnp arrays; safe to close over in jitted
    functions (the tables become XLA constants).
    """

    def __init__(self, config: SchedulerConfig | None = None):
        self.config = config or SchedulerConfig()
        betas = make_betas(self.config)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        self.betas = jnp.asarray(betas, dtype=jnp.float32)
        self.alphas = jnp.asarray(alphas, dtype=jnp.float32)
        self.alphas_cumprod = jnp.asarray(alphas_cumprod, dtype=jnp.float32)
        self.sqrt_alphas_cumprod = jnp.asarray(np.sqrt(alphas_cumprod), dtype=jnp.float32)
        self.sqrt_one_minus_alphas_cumprod = jnp.asarray(
            np.sqrt(1.0 - alphas_cumprod), dtype=jnp.float32
        )

    # -- helpers -----------------------------------------------------------
    def _gather(self, table: jnp.ndarray, timesteps: jnp.ndarray, ndim: int) -> jnp.ndarray:
        """Gather per-sample coefficients and broadcast to an ndim tensor."""
        vals = table[timesteps]
        return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))

    # -- diffusers-equivalent surface --------------------------------------
    def add_noise(
        self, original_samples: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        sqrt_ac = self._gather(self.sqrt_alphas_cumprod, timesteps, original_samples.ndim)
        sqrt_omac = self._gather(
            self.sqrt_one_minus_alphas_cumprod, timesteps, original_samples.ndim
        )
        return sqrt_ac * original_samples + sqrt_omac * noise

    def scale_model_input(self, sample: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
        """DDPM does not rescale model input (diffusers DDPMScheduler parity)."""
        del timesteps
        return sample

    def get_velocity(
        self, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        sqrt_ac = self._gather(self.sqrt_alphas_cumprod, timesteps, sample.ndim)
        sqrt_omac = self._gather(self.sqrt_one_minus_alphas_cumprod, timesteps, sample.ndim)
        return sqrt_ac * noise - sqrt_omac * sample

    def pred_original_sample(
        self, model_output: jnp.ndarray, timesteps: jnp.ndarray, sample: jnp.ndarray
    ) -> jnp.ndarray:
        """x0 estimate — the vectorised ``step(...).pred_original_sample``."""
        sqrt_ac = self._gather(self.sqrt_alphas_cumprod, timesteps, sample.ndim)
        sqrt_omac = self._gather(self.sqrt_one_minus_alphas_cumprod, timesteps, sample.ndim)
        alpha_prod = sqrt_ac * sqrt_ac
        if self.config.prediction_type == "epsilon":
            x0 = (sample - sqrt_omac * model_output) / sqrt_ac
        elif self.config.prediction_type == "v_prediction":
            x0 = sqrt_ac * sample - sqrt_omac * model_output
        elif self.config.prediction_type == "sample":
            x0 = model_output
        else:
            raise ValueError(f"unknown prediction_type {self.config.prediction_type!r}")
        del alpha_prod
        if self.config.clip_sample:
            x0 = jnp.clip(x0, -self.config.clip_sample_range, self.config.clip_sample_range)
        return x0

    def snr(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        """Signal-to-noise ratio abar/(1-abar) (diffusers compute_snr parity)."""
        ac = self.alphas_cumprod[timesteps]
        return ac / (1.0 - ac)


def compute_snr(scheduler: DDPMScheduler, timesteps: jnp.ndarray) -> jnp.ndarray:
    """Free-function alias matching the diffusers.training_utils import used at
    reference sid_training_loop.py:30,440."""
    return scheduler.snr(timesteps)


def betas_for_tests() -> Tuple[np.ndarray, np.ndarray]:
    """Convenience: (betas, alphas_cumprod) in float64 for analytic checks."""
    cfg = SchedulerConfig()
    betas = make_betas(cfg)
    return betas, np.cumprod(1.0 - betas)
