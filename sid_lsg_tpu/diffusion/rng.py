"""Per-seed deterministic latent generation.

Capability parity with the reference's ``StackedRandomGenerator``
(``generate_onestep.py:30-44``): every generated image is bit-reproducible
from its integer seed alone, independent of batch composition or device
count.  Torch builds one ``torch.Generator`` per sample; the TPU-native form
derives one PRNG key per seed (``jax.random.PRNGKey(seed)``) and vmaps the
draw — one fused kernel for the whole batch, no python loop.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class StackedRandomGenerator:
    """Batch of independent per-seed generators (same API shape as reference)."""

    def __init__(self, seeds: Sequence[int]):
        self.seeds = np.asarray(seeds, dtype=np.uint32)
        self._keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(self.seeds))
        self._draws = 0

    def _next_keys(self) -> jnp.ndarray:
        # Distinct stream per call so randn() then randint() are independent.
        keys = jax.vmap(jax.random.fold_in)(self._keys, jnp.full(len(self.seeds), self._draws))
        self._draws += 1
        return keys

    def randn(self, shape: Tuple[int, ...], dtype=jnp.float32) -> jnp.ndarray:
        """shape[0] must equal len(seeds); one independent draw per sample."""
        assert shape[0] == len(self.seeds)
        keys = self._next_keys()
        return jax.vmap(lambda k: jax.random.normal(k, shape[1:], dtype))(keys)

    def randint(self, low: int, high: int, shape: Tuple[int, ...]) -> jnp.ndarray:
        assert shape[0] == len(self.seeds)
        keys = self._next_keys()
        return jax.vmap(lambda k: jax.random.randint(k, shape[1:], low, high))(keys)


def seeded_latents(
    seeds: Sequence[int], latent_size: int, channels: int = 4
) -> jnp.ndarray:
    """(len(seeds), H, W, C) standard-normal latents, one seed per sample."""
    return StackedRandomGenerator(seeds).randn(
        (len(seeds), latent_size, latent_size, channels)
    )
