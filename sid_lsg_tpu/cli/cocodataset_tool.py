"""COCO eval-set preparation tool.

Capability parity with reference ``cocodataset_tool.py`` (:65-91, 313-425):
convert COCO2014 validation images + ``captions_val2014.json`` annotations
into the flat eval layout the metric stack consumes — one square
center-cropped PNG per image with a sibling ``.txt`` holding its (first)
caption.  Square power-of-two output is enforced like the reference
(:403-412); the GigaGAN/SiD-LSG protocol uses 256.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import click
import numpy as np


def center_crop_resize(img, size: int):
    """Center-crop to square then Lanczos-resize (reference make_transform:214)."""
    from PIL import Image

    w, h = img.size
    s = min(w, h)
    img = img.crop(((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2))
    return img.resize((size, size), Image.LANCZOS)


def convert_coco(
    source: str,
    annotations: str,
    dest: str,
    resolution: int = 256,
    max_images: Optional[int] = None,
    captions_out: Optional[str] = None,
) -> int:
    from PIL import Image

    if resolution & (resolution - 1) != 0:
        raise click.UsageError("--resolution must be a power of two (reference parity)")
    with open(annotations, encoding="utf-8") as f:
        ann = json.load(f)
    file_by_id = {img["id"]: img["file_name"] for img in ann["images"]}
    caption_by_id: dict = {}
    for a in ann["annotations"]:
        caption_by_id.setdefault(a["image_id"], a["caption"].strip())
    # Output is a folder of img+txt pairs, or (reference training/dataset.py
    # zip-ingestion parity) the same pairs inside a .zip archive that
    # data/mscoco.CocoCaptionDataset reads directly.
    import contextlib

    as_zip = dest.endswith(".zip")
    if as_zip:
        import zipfile

        if os.path.dirname(dest):
            os.makedirs(os.path.dirname(dest), exist_ok=True)
        # Context-managed so a mid-conversion failure (corrupt source image,
        # interrupt) still writes the central directory: everything converted
        # so far stays readable instead of leaving a BadZipFile truncation
        # after an hours-long run.
        zf_ctx = zipfile.ZipFile(dest, "w", zipfile.ZIP_STORED)
    else:
        os.makedirs(dest, exist_ok=True)
        zf_ctx = contextlib.nullcontext(None)
    count = 0
    captions = []
    with zf_ctx as zf:
        for image_id in sorted(caption_by_id):
            if max_images is not None and count >= max_images:
                break
            src = os.path.join(source, file_by_id[image_id])
            if not os.path.exists(src):
                continue
            img = Image.open(src).convert("RGB")
            img = center_crop_resize(img, resolution)
            if as_zip:
                import io

                buf = io.BytesIO()
                img.save(buf, format="png")
                zf.writestr(f"{count:08d}.png", buf.getvalue())
                zf.writestr(f"{count:08d}.txt",
                            caption_by_id[image_id].encode("utf-8"))
            else:
                base = os.path.join(dest, f"{count:08d}")
                img.save(base + ".png")
                with open(base + ".txt", "w", encoding="utf-8") as f:
                    f.write(caption_by_id[image_id])
            captions.append(caption_by_id[image_id].replace("\n", " "))
            count += 1
    if captions_out:
        # The eval caption corpus (reference prompts/captions.txt, consumed by
        # generate_onestep.py:120): line i is the prompt for seed i, ordered
        # like the eval images above so FID reals and fakes align.
        with open(captions_out, "w", encoding="utf-8") as f:
            f.write("\n".join(captions) + "\n")
    return count


@click.command()
@click.option("--source", help="COCO val2014 images directory", type=str, required=True)
@click.option("--annotations", help="captions_val2014.json", type=str, required=True)
@click.option("--dest", help="Output folder or .zip archive (img+txt pairs)",
              type=str, required=True)
@click.option("--resolution", type=int, default=256, show_default=True)
@click.option("--max-images", "max_images", type=int, default=None)
@click.option("--captions-out", "captions_out", type=str, default=None,
              help="Also write the caption corpus (one prompt per line, the "
              "reference prompts/captions.txt role) to this path")
def main(source: str, annotations: str, dest: str, resolution: int,
         max_images: Optional[int], captions_out: Optional[str]) -> None:
    n = convert_coco(source, annotations, dest, resolution, max_images, captions_out)
    print(f"wrote {n} image+caption pairs to {dest}")


if __name__ == "__main__":
    main()
