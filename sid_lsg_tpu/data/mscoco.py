"""MS-COCO eval dataset: paired image + caption files, from a dir or zip.

Covers reference ``training/mscoco_dataset.py`` (recursive ``img.png`` +
sibling ``img.txt`` pairing via blobfile, lines 11-24; uint8 CHW + caption at
46-68) plus the directory-or-zip ingestion of the reference's base dataset
(``training/dataset.py:168-203``) — so an archive produced by
``dataset_tool --dest out.zip`` or ``cocodataset_tool --dest out.zip`` feeds
the metric stack directly.  Differences from the reference: NHWC uint8 output
(TPU layout) and batch iteration with process-striding for multi-host metric
runs (the role of the rank-strided ``item_subset`` at reference
``sid_metric_utils.py:274``).

Captions: an image's caption is its sibling ``<base>.txt`` when present,
else the empty string (``dataset_tool`` archives carry no captions — they
still serve FID real-stats, which ignore captions).
"""

from __future__ import annotations

import os
import zipfile
from typing import Iterator, List, Optional, Tuple

import numpy as np

_IMG_EXTS = (".png", ".jpg", ".jpeg")


class _DirBackend:
    def __init__(self, root: str):
        self.root = root
        self.fnames = sorted(
            os.path.relpath(os.path.join(dirpath, f), root)
            for dirpath, _, files in os.walk(root)
            for f in files
        )

    def open(self, fname: str):
        return open(os.path.join(self.root, fname), "rb")


class _ZipBackend:
    """Zip archive reader (reference training/dataset.py:201-213 semantics).

    The handle is opened lazily and dropped on pickling — zipfile handles
    are not fork/pickle-safe (same treatment as the reference's
    ``__getstate__``)."""

    def __init__(self, path: str):
        self.path = path
        self._zf: Optional[zipfile.ZipFile] = None
        with zipfile.ZipFile(path) as zf:
            self.fnames = sorted(n for n in zf.namelist() if not n.endswith("/"))

    def _zip(self) -> zipfile.ZipFile:
        if self._zf is None:
            self._zf = zipfile.ZipFile(self.path)
        return self._zf

    def open(self, fname: str):
        return self._zip().open(fname, "r")

    def __getstate__(self):
        return dict(self.__dict__, _zf=None)


class CocoCaptionDataset:
    """(uint8 HWC image, caption) pairs from a prepared eval folder or zip."""

    def __init__(self, path: str, resolution: Optional[int] = None, max_size: Optional[int] = None):
        self.path = path
        self.resolution = resolution
        if os.path.isdir(path):
            self._backend = _DirBackend(path)
            self.name = os.path.basename(os.path.normpath(path))
        elif os.path.splitext(path)[1].lower() == ".zip":
            self._backend = _ZipBackend(path)
            self.name = os.path.splitext(os.path.basename(path))[0]
        else:
            raise IOError(f"{path!r} must point to a directory or .zip archive")
        names = set(self._backend.fnames)
        self.pairs = []
        for f in self._backend.fnames:
            base, ext = os.path.splitext(f)
            if ext.lower() in _IMG_EXTS:
                txt = base + ".txt"
                self.pairs.append((f, txt if txt in names else None))
        if max_size is not None:
            self.pairs = self.pairs[:max_size]
        if not self.pairs:
            raise FileNotFoundError(f"no images under {path}")

    def __len__(self) -> int:
        return len(self.pairs)

    def _caption(self, txt_name: Optional[str]) -> str:
        if txt_name is None:
            return ""
        with self._backend.open(txt_name) as f:
            return f.read().decode("utf-8").strip()

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, str]:
        from PIL import Image

        img_name, txt_name = self.pairs[idx]
        with self._backend.open(img_name) as f:
            img = Image.open(f).convert("RGB")
        if self.resolution is not None and img.size != (self.resolution, self.resolution):
            img = img.resize((self.resolution, self.resolution), Image.LANCZOS)
        return np.asarray(img, dtype=np.uint8), self._caption(txt_name)

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

    def captions(self, max_items: Optional[int] = None,
                 allow_missing: bool = False) -> List[str]:
        """Captions for the first ``n`` items.  Caption-CONDITIONED use
        (generator prompts) must not silently run on empty strings, so by
        default any caption-less image raises — the loud contract of the
        reference's pair-requiring ``mscoco_dataset.py:11-24``.  Caption-free
        archives (``dataset_tool`` output) stay usable for FID real-stats via
        ``allow_missing=True`` or the caption-ignoring ``batches`` path."""
        n = len(self) if max_items is None else min(len(self), max_items)
        missing = [self.pairs[i][0] for i in range(n) if self.pairs[i][1] is None]
        if missing and not allow_missing:
            raise FileNotFoundError(
                f"{len(missing)}/{n} images under {self.path} have no sibling "
                f".txt caption (first: {missing[0]!r}); caption-conditioned "
                "metrics need one per image — pass allow_missing=True only "
                "for caption-free stats.")
        return [self._caption(self.pairs[i][1]) for i in range(n)]
