"""MS-COCO eval dataset: paired image + caption files.

Covers reference ``training/mscoco_dataset.py`` (recursive ``img.png`` +
sibling ``img.txt`` pairing via blobfile, lines 11-24; uint8 CHW + caption at
46-68).  Differences: plain ``os.walk`` instead of blobfile (local-dir eval
corpus), NHWC uint8 output (TPU layout), and batch iteration with
process-striding for multi-host metric runs (the role of the rank-strided
``item_subset`` at reference ``sid_metric_utils.py:274``).
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

_IMG_EXTS = (".png", ".jpg", ".jpeg")


def _list_pairs(root: str) -> List[Tuple[str, str]]:
    pairs = []
    for dirpath, _, files in os.walk(root):
        names = set(files)
        for f in sorted(files):
            base, ext = os.path.splitext(f)
            if ext.lower() in _IMG_EXTS and base + ".txt" in names:
                pairs.append(
                    (os.path.join(dirpath, f), os.path.join(dirpath, base + ".txt"))
                )
    return sorted(pairs)


class CocoCaptionDataset:
    """(uint8 HWC image, caption) pairs from a prepared eval folder."""

    def __init__(self, path: str, resolution: Optional[int] = None, max_size: Optional[int] = None):
        self.path = path
        self.resolution = resolution
        self.pairs = _list_pairs(path)
        if max_size is not None:
            self.pairs = self.pairs[:max_size]
        if not self.pairs:
            raise FileNotFoundError(f"no image+caption pairs under {path}")
        self.name = os.path.basename(os.path.normpath(path))

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, str]:
        from PIL import Image

        img_path, txt_path = self.pairs[idx]
        img = Image.open(img_path).convert("RGB")
        if self.resolution is not None and img.size != (self.resolution, self.resolution):
            img = img.resize((self.resolution, self.resolution), Image.LANCZOS)
        with open(txt_path, encoding="utf-8") as f:
            caption = f.read().strip()
        return np.asarray(img, dtype=np.uint8), caption

    def batches(
        self,
        batch_size: int,
        process_index: int = 0,
        process_count: int = 1,
        max_items: Optional[int] = None,
    ) -> Iterator[Tuple[np.ndarray, List[str]]]:
        """Process-strided batch iterator for distributed metric loops."""
        n = len(self) if max_items is None else min(len(self), max_items)
        idxs = list(range(process_index, n, process_count))
        for i in range(0, len(idxs), batch_size):
            chunk = idxs[i : i + batch_size]
            imgs, caps = zip(*(self[j] for j in chunk))
            yield np.stack(imgs), list(caps)

    def captions(self, max_items: Optional[int] = None) -> List[str]:
        n = len(self) if max_items is None else min(len(self), max_items)
        out = []
        for i in range(n):
            with open(self.pairs[i][1], encoding="utf-8") as f:
                out.append(f.read().strip())
        return out
