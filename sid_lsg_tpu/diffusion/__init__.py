from .ddpm import DDPMScheduler, SchedulerConfig, compute_snr
from .sampling import sid_sampler, sid_denoise

__all__ = ["DDPMScheduler", "SchedulerConfig", "compute_snr", "sid_sampler", "sid_denoise"]
