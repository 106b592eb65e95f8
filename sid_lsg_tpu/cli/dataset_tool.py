"""Generic image dataset preparation tool.

Capability parity with reference ``dataset_tool.py`` (StyleGAN-ADA lineage,
:57-221, 342-465): read a folder / zip / npz of images (+ optional
``dataset.json`` labels), apply center-crop/resize transforms, and write a
flat archive (folder or zip) of ``{idx:08d}.png`` plus ``dataset.json``.
LMDB/MNIST/CIFAR readers of the reference are out of scope unless those
corpora enter the workflow; folder/zip/npz cover the SiD-LSG paths.
"""

from __future__ import annotations

import json
import os
import zipfile
from typing import Iterator, Optional, Tuple

import click
import numpy as np

from .cocodataset_tool import center_crop_resize

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def _iter_source(source: str) -> Iterator[Tuple[str, "object"]]:
    from PIL import Image

    if source.endswith(".zip"):
        with zipfile.ZipFile(source) as zf:
            for name in sorted(zf.namelist()):
                if name.lower().endswith(_IMG_EXTS):
                    with zf.open(name) as f:
                        yield name, Image.open(f).convert("RGB")
    elif source.endswith(".npz"):
        arr = np.load(source)["arr_0"]
        for i in range(len(arr)):
            yield f"{i:08d}", Image.fromarray(arr[i])
    else:
        for root, _, files in os.walk(source):
            for f in sorted(files):
                if f.lower().endswith(_IMG_EXTS):
                    p = os.path.join(root, f)
                    yield os.path.relpath(p, source), Image.open(p).convert("RGB")


def _load_labels(source: str) -> dict:
    cand = os.path.join(source, "dataset.json") if os.path.isdir(source) else None
    if cand and os.path.exists(cand):
        with open(cand, encoding="utf-8") as f:
            return dict(json.load(f).get("labels") or [])
    return {}


@click.command()
@click.option("--source", help="Input folder / .zip / .npz", type=str, required=True)
@click.option("--dest", help="Output folder or .zip", type=str, required=True)
@click.option("--resolution", help="Output side length (center-crop square)", type=int, default=None)
@click.option("--max-images", "max_images", type=int, default=None)
def main(source: str, dest: str, resolution: Optional[int], max_images: Optional[int]) -> None:
    labels_in = _load_labels(source)
    labels_out = []
    as_zip = dest.endswith(".zip")
    zf = zipfile.ZipFile(dest, "w", zipfile.ZIP_STORED) if as_zip else None
    if not as_zip:
        os.makedirs(dest, exist_ok=True)
    count = 0
    for name, img in _iter_source(source):
        if max_images is not None and count >= max_images:
            break
        if resolution:
            img = center_crop_resize(img, resolution)
        out_name = f"{count:08d}.png"
        if as_zip:
            import io

            buf = io.BytesIO()
            img.save(buf, format="png")
            zf.writestr(out_name, buf.getvalue())
        else:
            img.save(os.path.join(dest, out_name))
        if name in labels_in:
            labels_out.append([out_name, labels_in[name]])
        count += 1
    meta = json.dumps({"labels": labels_out if labels_out else None})
    if as_zip:
        zf.writestr("dataset.json", meta)
        zf.close()
    else:
        with open(os.path.join(dest, "dataset.json"), "w") as f:
            f.write(meta)
    print(f"wrote {count} images to {dest}")


if __name__ == "__main__":
    main()
