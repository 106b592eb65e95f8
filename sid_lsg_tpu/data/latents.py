"""Real-image latent stream for SiDA adversarial training.

SiD-LSG proper is data-free; the adversarial roadmap the reference announces
(``/root/reference/README.md:12``) needs real images.  The TPU-native shape
of that requirement: VAE-encode the corpus ONCE offline
(``cli/encode_latents.py``) into an npz of latents + captions, then stream
microbatches from host RAM — no per-step image decode/resize/VAE work on the
training critical path, and the npz mmap keeps startup O(1).

File format (``.npz``):
  - ``latents``: (N, h, w, c) float16/float32 — VAE posterior means,
    ALREADY multiplied by the VAE ``scaling_factor`` (i.e. in the same space
    the UNet consumes)
  - ``captions``: (N,) unicode array of the paired prompts
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


class LatentDataset:
    """mmap-backed (latent, caption) pairs from an ``encode_latents`` npz."""

    def __init__(self, path: str):
        self.path = path
        data = np.load(path, mmap_mode="r")
        if "latents" not in data or "captions" not in data:
            raise ValueError(
                f"{path}: expected arrays 'latents' and 'captions' "
                "(produce with: python -m sid_lsg_tpu.cli.encode_latents)"
            )
        self.latents = data["latents"]
        self.captions = [str(c) for c in data["captions"]]
        if len(self.latents) != len(self.captions):
            raise ValueError(f"{path}: latents/captions length mismatch")

    def __len__(self) -> int:
        return len(self.captions)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, str]:
        return np.asarray(self.latents[idx], np.float32), self.captions[idx]


class InfiniteLatentIterator:
    """Endless shuffled microbatches, process-strided for multi-host runs
    (same striding contract as ``prompts.InfinitePromptIterator``)."""

    def __init__(
        self,
        dataset: LatentDataset,
        batch_size: int,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self._epoch = 0
        self._pos = 0
        self._order: Optional[np.ndarray] = None

    def _reshuffle(self) -> None:
        rng = np.random.RandomState(self.seed + self._epoch)
        order = rng.permutation(len(self.dataset))
        self._order = order[self.process_index :: self.process_count]
        self._pos = 0
        self._epoch += 1

    def __iter__(self) -> "InfiniteLatentIterator":
        return self

    def __next__(self) -> Tuple[np.ndarray, List[str]]:
        lats, caps = [], []
        while len(caps) < self.batch_size:
            if self._order is None or self._pos >= len(self._order):
                self._reshuffle()
            lat, cap = self.dataset[int(self._order[self._pos])]
            self._pos += 1
            lats.append(lat)
            caps.append(cap)
        return np.stack(lats), caps
