"""Precompute a real-image latent corpus for SiDA adversarial training.

Reads a prepared flat eval layout (``cocodataset_tool`` output: one PNG per
image with a sibling ``.txt`` caption) — or any folder of images with paired
caption files — VAE-encodes the images in device batches, and writes ONE npz
(``latents`` scaled into UNet space, ``captions``) that
``data/latents.LatentDataset`` streams during training.

This is the offline half of the announced SiDA integration
(``/root/reference/README.md:12``): doing the VAE encode once here keeps the
training step free of pixel-space work (``training/adversarial.py``).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import click
import numpy as np


def _list_pairs(source: str) -> List[Tuple[str, str]]:
    exts = (".png", ".jpg", ".jpeg", ".webp")
    pairs = []
    for name in sorted(os.listdir(source)):
        base, ext = os.path.splitext(name)
        txt = os.path.join(source, base + ".txt")
        if ext.lower() in exts and os.path.exists(txt):
            pairs.append((os.path.join(source, name), txt))
    if not pairs:
        raise click.UsageError(
            f"{source}: no image/.txt caption pairs found "
            "(prepare with sid-cocodataset-tool)"
        )
    return pairs


@click.command()
@click.option("--source", help="Folder of image + sibling .txt caption pairs", required=True)
@click.option("--dest", help="Output .npz path", required=True)
@click.option("--repo_id", help="SD checkpoint dir or preset (for the VAE)",
              type=str, default="sd15", show_default=True)
@click.option("--batch", type=click.IntRange(min=1), default=32, show_default=True)
@click.option("--max_images", type=click.IntRange(min=1), default=None)
@click.option("--use_bf16", type=bool, default=True, show_default=True)
def main(source, dest, repo_id, batch, max_images, use_bf16):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..pipeline import SDPipeline
    from ..runtime.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    pipe = SDPipeline.from_pretrained(
        repo_id, dtype=jnp.bfloat16 if use_bf16 else jnp.float32
    )
    vae = pipe.vae
    scale = pipe.config.vae.scaling_factor

    @jax.jit
    def encode(params, images):
        # Posterior MEAN (deterministic corpus; the sampled noise the training
        # step adds dominates any posterior stddev).  Scaled into UNet space.
        z = vae.apply({"params": params}, images, method=vae.encode)
        return (z * scale).astype(jnp.float16)

    pairs = _list_pairs(source)
    if max_images is not None:
        pairs = pairs[:max_images]
    all_latents, all_captions = [], []
    corpus_hw = None  # every image must share one resolution (jit + np.stack)
    for start in range(0, len(pairs), batch):
        chunk = pairs[start : start + batch]
        imgs, caps = [], []
        for img_path, txt_path in chunk:
            img = np.asarray(Image.open(img_path).convert("RGB"), np.float32)
            if corpus_hw is None:
                corpus_hw = img.shape[:2]
            elif img.shape[:2] != corpus_hw:
                raise click.UsageError(
                    f"{img_path}: size {img.shape[1]}x{img.shape[0]} differs "
                    f"from the corpus's {corpus_hw[1]}x{corpus_hw[0]} — all "
                    "images must share one resolution. Prepare the folder "
                    "with sid-cocodataset-tool (square center-crop resize)."
                )
            imgs.append(img / 127.5 - 1.0)
            with open(txt_path, encoding="utf-8") as f:
                caps.append(f.read().strip())
        # Pad the tail chunk to the jitted batch shape (one compile total).
        n = len(imgs)
        while len(imgs) < batch:
            imgs.append(imgs[-1])
        z = encode(pipe.params["vae"], jnp.asarray(np.stack(imgs)))
        all_latents.append(np.asarray(z[:n], np.float16))
        all_captions.extend(caps)
        click.echo(f"\rencoded {start + n}/{len(pairs)}", nl=False)
    click.echo("")
    latents = np.concatenate(all_latents, axis=0)
    os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
    # Latents go into a RAW sidecar .npy (np.load(npz, mmap_mode=...) is
    # silently ignored for zip archives): data/latents.LatentDataset mmaps
    # this file, keeping training startup O(1) in corpus size.
    from ..data.latents import _sidecar_path

    sidecar = _sidecar_path(os.path.abspath(dest))
    mm = np.lib.format.open_memmap(
        sidecar, mode="w+", dtype=np.float16, shape=latents.shape
    )
    mm[:] = latents
    mm.flush()
    np.savez(dest, captions=np.array(all_captions))
    click.echo(f"wrote {sidecar}: {latents.shape} float16 (mmap source) and "
               f"{dest}: {len(all_captions)} captions")


if __name__ == "__main__":
    main()
