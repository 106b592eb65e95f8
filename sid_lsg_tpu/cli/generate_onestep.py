"""One-step (or few-step) image generation CLI — the 30k-eval producer.

Capability parity with reference ``generate_onestep.py`` (CLI at 110-126, hot
loop at 277-310): seeds map to caption indices, per-seed deterministic
latents, `{seed:06d}.png` naming with optional thousand-seed subdirs, npz
packing, `_numstep{n}` outdir suffix for multistep eval, multi-host seed
striding.  TPU-native: one process drives all local chips with one jitted
generate function (batch-sharded over the mesh); no per-batch barrier exists
because there are no rank processes.
"""

from __future__ import annotations

import os
from typing import List, Optional

import click
import numpy as np

from . import parse_int_list
from ..data.prompts import read_prompt_file
from ..diffusion.rng import StackedRandomGenerator
from ..parallel import runtime


def compress_to_npz(folder_path: str, num: int = 50000) -> str:
    """Pack generated PNGs into `{folder}.npz` (arr_0 stack), reference :80-107."""
    from PIL import Image

    npz_path = f"{folder_path}.npz"
    paths = sorted(
        os.path.join(root, f)
        for root, _, files in os.walk(folder_path)
        for f in files
        if f.endswith((".png", ".jpg", ".jpeg"))
    )[:num]
    samples = np.stack([np.asarray(Image.open(p), dtype=np.uint8) for p in paths])
    np.savez(npz_path, arr_0=samples)
    return npz_path


def generate_images(
    pipe,
    captions: List[str],
    seeds: List[int],
    outdir: str,
    max_batch_size: int = 16,
    init_timestep: int = 625,
    num_steps_eval: int = 1,
    subdirs: bool = False,
    custom_seed: bool = False,
    process_index: int = 0,
    process_count: int = 1,
    progress: bool = True,
) -> int:
    """Generate one image per seed; returns the number written by this host."""
    import jax

    if num_steps_eval > 1:
        outdir = f"{outdir}_numstep{num_steps_eval}"
    os.makedirs(outdir, exist_ok=True)
    latent_size = pipe.config.unet.sample_size
    my_seeds = [s for i, s in enumerate(seeds) if i % process_count == process_index]
    written = 0
    done = 0

    # Disk path through the native PNG writer (one C call per batch).
    from .. import native

    def flush(pending) -> int:
        """Read back + encode a finished batch (host work that the device
        overlaps with computing the NEXT batch — the dispatch for batch N+1
        is already enqueued when this runs; the reference loop is fully
        serial here, generate_onestep.py:277-310)."""
        dev_images, batch_seeds = pending
        out_paths = []
        for seed in batch_seeds:
            d = os.path.join(outdir, f"{seed - seed % 1000:06d}") if subdirs else outdir
            os.makedirs(d, exist_ok=True)
            out_paths.append(os.path.join(d, f"{seed:06d}.png"))
        native.write_png_batch(out_paths, np.asarray(dev_images)[: len(batch_seeds)])
        return len(batch_seeds)

    pending = None  # (on-device uint8 batch, its real seeds)
    for start in range(0, len(my_seeds), max_batch_size):
        batch_seeds = my_seeds[start : start + max_batch_size]
        # Static batch shape for jit cache: pad the tail batch, drop extras.
        pad = max_batch_size - len(batch_seeds)
        padded = batch_seeds + batch_seeds[:1] * pad
        rng_seeds = [seeds[i] for i in padded] if custom_seed else padded
        latents = StackedRandomGenerator(rng_seeds).randn(
            (len(padded), latent_size, latent_size, 4)
        )
        prompts = [captions[i % len(captions)] for i in padded]
        images = pipe.generate(
            prompts, latents, num_steps=num_steps_eval,
            init_timestep=init_timestep, rng=jax.random.PRNGKey(0),
            as_numpy=False,  # async: don't block before dispatching ahead
        )
        if pending is not None:
            n = flush(pending)
            written += n
            done += n
            if progress and process_index == 0:
                runtime.print0(f"  {done}/{len(my_seeds)} images")
        pending = (images, batch_seeds)
    if pending is not None:
        n = flush(pending)
        written += n
        done += n
        if progress and process_index == 0:
            runtime.print0(f"  {done}/{len(my_seeds)} images")
    return written


@click.command()
@click.option("--network", "network_path", help="Generator checkpoint (.safetensors / reference .pkl / orbax dir)", type=str, default=None)
@click.option("--outdir", help="Where to save images", type=str, required=True)
@click.option("--seeds", help="Random seeds (e.g. 1,2,5-10); double as caption indices", type=str, default="0-63", show_default=True)
@click.option("--subdirs", help="Subdirectory per 1000 seeds", is_flag=True)
@click.option("--batch", "max_batch_size", help="Maximum batch size", type=click.IntRange(min=1), default=16, show_default=True)
@click.option("--num", "num_samples", help="Maximum number of images", type=click.IntRange(min=1), default=30000, show_default=True)
@click.option("--init_timestep", type=click.IntRange(min=0, max=999), default=625, show_default=True)
@click.option("--text_prompts", help="Captions file (30k COCO prompts for eval)", type=str, default="prompts/captions.txt", show_default=True)
@click.option("--repo_id", help="Base SD checkpoint dir or preset (sd15/sd21base/tiny)", type=str, default="sd15", show_default=True)
@click.option("--use_bf16", help="bf16 activations", type=bool, default=True, show_default=True)
@click.option("--enable_compress_npz", type=bool, default=False, show_default=True)
@click.option("--num_steps_eval", type=click.IntRange(min=1), default=1, show_default=True)
@click.option("--custom_seed", help="Map seed list positions to caption indices", type=bool, default=False, show_default=True)
def main(
    network_path: Optional[str],
    outdir: str,
    seeds: str,
    subdirs: bool,
    max_batch_size: int,
    num_samples: int,
    init_timestep: int,
    text_prompts: str,
    repo_id: str,
    use_bf16: bool,
    enable_compress_npz: bool,
    num_steps_eval: int,
    custom_seed: bool,
) -> None:
    import jax.numpy as jnp

    from ..pipeline import SDPipeline

    runtime.init_distributed()
    seed_list = parse_int_list(seeds)[:num_samples]
    captions = read_prompt_file(text_prompts) if os.path.exists(text_prompts) else [""]
    pipe = SDPipeline.from_pretrained(
        repo_id, dtype=jnp.bfloat16 if use_bf16 else jnp.float32
    )
    if network_path:
        pipe.load_generator(network_path)
    runtime.print0(f'Generating {len(seed_list)} images to "{outdir}"...')
    generate_images(
        pipe, captions, seed_list, outdir,
        max_batch_size=max_batch_size,
        init_timestep=init_timestep,
        num_steps_eval=num_steps_eval,
        subdirs=subdirs,
        custom_seed=custom_seed,
        process_index=runtime.get_process_index(),
        process_count=runtime.get_process_count(),
    )
    runtime.sync_hosts("generate-done")
    if enable_compress_npz and runtime.get_process_index() == 0:
        real_outdir = f"{outdir}_numstep{num_steps_eval}" if num_steps_eval > 1 else outdir
        runtime.print0(f"packed: {compress_to_npz(real_outdir, num_samples)}")
    runtime.print0("done.")


if __name__ == "__main__":
    main()
