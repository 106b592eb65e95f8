"""Generic image dataset preparation tool.

Capability parity with reference ``dataset_tool.py`` (StyleGAN-ADA lineage,
:57-221, 342-465): read a folder / zip / npz / CIFAR-10 tarball / MNIST idx
archive / LMDB of images (+ labels where the source carries them), apply a
center-crop/resize transform, and write a flat archive (folder or zip) of
``{idx:08d}.png`` plus ``dataset.json``.

Source detection mirrors the reference's (:342-365): ``*.zip`` archive,
``cifar-10-python.tar.gz``-style tarball, ``*-images-idx3-ubyte.gz`` MNIST
images (labels resolved by filename), a directory with an LMDB ``data.mdb``
inside, ``*.npz`` arrays, else an image folder.  The LMDB path needs the
optional ``lmdb`` package (not bundled; a clear error says so).
"""

from __future__ import annotations

import gzip
import json
import os
import pickle
import tarfile
import zipfile
from typing import Iterator, Optional, Tuple

import click
import numpy as np

from .cocodataset_tool import center_crop_resize

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")

# Each reader yields (name, PIL image, optional label).


def _iter_folder(source: str):
    from PIL import Image

    labels = _load_labels_json(source)
    for root, _, files in os.walk(source):
        for f in sorted(files):
            if f.lower().endswith(_IMG_EXTS):
                p = os.path.join(root, f)
                rel = os.path.relpath(p, source)
                yield rel, Image.open(p).convert("RGB"), labels.get(rel)


def _iter_zip(source: str):
    from PIL import Image

    with zipfile.ZipFile(source) as zf:
        labels = {}
        if "dataset.json" in zf.namelist():
            with zf.open("dataset.json") as f:
                labels = dict(json.load(f).get("labels") or [])
        for name in sorted(zf.namelist()):
            if name.lower().endswith(_IMG_EXTS):
                with zf.open(name) as f:
                    yield name, Image.open(f).convert("RGB"), labels.get(name)


def _iter_npz(source: str):
    from PIL import Image

    arr = np.load(source)["arr_0"]
    for i in range(len(arr)):
        yield f"{i:08d}", Image.fromarray(arr[i]), None


def _iter_cifar10(source: str):
    """CIFAR-10 python tarball: 5 train batches of 10k 32x32 RGB + labels
    (reference dataset_tool.py:141-170)."""
    from PIL import Image

    images, labels = [], []
    with tarfile.open(source, "r:gz") as tar:
        for batch in range(1, 6):
            member = tar.getmember(f"cifar-10-batches-py/data_batch_{batch}")
            with tar.extractfile(member) as f:
                data = pickle.load(f, encoding="latin1")
            images.append(np.asarray(data["data"], np.uint8).reshape(-1, 3, 32, 32))
            labels.append(np.asarray(data["labels"]))
    images = np.concatenate(images).transpose(0, 2, 3, 1)  # NCHW -> NHWC
    labels = np.concatenate(labels)
    for i in range(len(images)):
        yield f"{i:08d}", Image.fromarray(images[i]), int(labels[i])


def _iter_mnist(source: str):
    """MNIST idx-ubyte gz pair, images zero-padded 28->32 like the reference
    (dataset_tool.py:193-220); labels file resolved from the images filename."""
    from PIL import Image

    labels_gz = source.replace("-images-idx3-ubyte.gz", "-labels-idx1-ubyte.gz")
    assert labels_gz != source, "expected *-images-idx3-ubyte.gz"
    with gzip.open(source, "rb") as f:
        images = np.frombuffer(f.read(), np.uint8, offset=16).reshape(-1, 28, 28)
    with gzip.open(labels_gz, "rb") as f:
        labels = np.frombuffer(f.read(), np.uint8, offset=8)
    images = np.pad(images, [(0, 0), (2, 2), (2, 2)], "constant")
    for i in range(len(images)):
        yield f"{i:08d}", Image.fromarray(images[i], "L").convert("RGB"), int(labels[i])


def _iter_lmdb(source: str):
    """LMDB of encoded images (reference dataset_tool.py:113-138)."""
    import io as _io

    from PIL import Image

    try:
        import lmdb  # optional dependency, not bundled in this image
    except ImportError as e:
        raise click.ClickException(
            "LMDB sources need the 'lmdb' package (pip install lmdb)"
        ) from e
    env = lmdb.open(source, readonly=True, lock=False)
    with env.begin(write=False) as txn:
        for i, (_key, value) in enumerate(txn.cursor()):
            try:
                img = Image.open(_io.BytesIO(value)).convert("RGB")
            except Exception as err:  # match reference: skip undecodable rows
                print(f"skipping lmdb entry {i}: {err}")
                continue
            yield f"{i:08d}", img, None


def _iter_source(source: str) -> Iterator[Tuple[str, "object", Optional[int]]]:
    if os.path.isdir(source):
        if os.path.exists(os.path.join(source, "data.mdb")):
            return _iter_lmdb(source)
        return _iter_folder(source)
    base = os.path.basename(source)
    if source.endswith(".zip"):
        return _iter_zip(source)
    if source.endswith(".npz"):
        return _iter_npz(source)
    if base.endswith(".tar.gz") and "cifar" in base.lower():
        return _iter_cifar10(source)
    if base.endswith("-images-idx3-ubyte.gz"):
        return _iter_mnist(source)
    raise click.ClickException(f"unrecognised source {source!r}")


def _load_labels_json(source: str) -> dict:
    cand = os.path.join(source, "dataset.json")
    if os.path.exists(cand):
        with open(cand, encoding="utf-8") as f:
            return dict(json.load(f).get("labels") or [])
    return {}


@click.command()
@click.option("--source", help="Input folder / .zip / .npz / cifar .tar.gz / "
              "mnist images .gz / LMDB dir", type=str, required=True)
@click.option("--dest", help="Output folder or .zip", type=str, required=True)
@click.option("--resolution", help="Output side length (center-crop square)", type=int, default=None)
@click.option("--max-images", "max_images", type=int, default=None)
def main(source: str, dest: str, resolution: Optional[int], max_images: Optional[int]) -> None:
    labels_out = []
    as_zip = dest.endswith(".zip")
    zf = zipfile.ZipFile(dest, "w", zipfile.ZIP_STORED) if as_zip else None
    if not as_zip:
        os.makedirs(dest, exist_ok=True)
    count = 0
    for name, img, label in _iter_source(source):
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
        if label is not None:
            labels_out.append([out_name, label])
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
