"""Real-image latent stream for SiDA adversarial training.

SiD-LSG proper is data-free; the adversarial roadmap the reference announces
(``/root/reference/README.md:12``) needs real images.  The TPU-native shape
of that requirement: VAE-encode the corpus ONCE offline
(``cli/encode_latents.py``), then stream microbatches — no per-step image
decode/resize/VAE work on the training critical path, and a memory-mapped
raw array keeps startup O(1) and host RAM flat.

File format (two files from one ``--dest foo.npz``):
  - ``foo.latents.npy``: (N, h, w, c) float16 raw array (open_memmap) — VAE
    posterior means ALREADY multiplied by the VAE ``scaling_factor`` (i.e.
    in the space the UNet consumes); this is the file that gets mmapped
  - ``foo.npz``: ``captions`` (N,) unicode array of the paired prompts
    (plus ``latents`` only in hand-built test fixtures — npz members cannot
    be memory-mapped, so real corpora live in the sidecar)
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional, Tuple

import numpy as np


def _sidecar_path(npz_path: str) -> str:
    root, _ = os.path.splitext(npz_path)
    return root + ".latents.npy"


class LatentDataset:
    """(latent, caption) pairs from an ``encode_latents`` corpus.

    Latents are memory-mapped from the raw ``<dest>.latents.npy`` sidecar the
    encoder writes — ``np.load(npz, mmap_mode=...)`` silently IGNORES
    mmap_mode for zip archives, so the sidecar is what actually keeps startup
    O(1) and host RAM flat on large corpora.  An npz without a sidecar
    (hand-built fixtures) falls back to in-RAM arrays with a stderr note.
    """

    def __init__(self, path: str):
        self.path = path
        data = np.load(path, mmap_mode="r")
        if "captions" not in data or ("latents" not in data and not
                                      os.path.exists(_sidecar_path(path))):
            raise ValueError(
                f"{path}: expected 'captions' plus 'latents' (or a "
                f"{_sidecar_path(path)} sidecar) "
                "(produce with: python -m sid_lsg_tpu.cli.encode_latents)"
            )
        sidecar = _sidecar_path(path)
        if os.path.exists(sidecar):
            self.latents = np.load(sidecar, mmap_mode="r")
        else:
            print(f"note: {sidecar} not found; loading latents from the npz "
                  "into RAM (fine for fixtures, O(corpus) for real data)",
                  file=sys.stderr)
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
        strided = order[self.process_index :: self.process_count]
        # Tiny corpus (< process_count): the stride can be empty for high
        # ranks — fall back to the full permutation so every process still
        # yields forever (the prompt-iterator contract).  That breaks the
        # disjoint multi-host striding (duplicated discriminator data), so
        # make it visible once.
        if not len(strided) and not getattr(self, "_warned_tiny", False):
            self._warned_tiny = True
            print(
                f"WARNING: latent corpus ({len(self.dataset)} items) is smaller "
                f"than the process count ({self.process_count}); process "
                f"{self.process_index} falls back to the FULL permutation — "
                "multi-host discriminator batches will overlap.",
                flush=True,
            )
        self._order = strided if len(strided) else order
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
