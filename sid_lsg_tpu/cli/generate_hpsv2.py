"""HPSv2 benchmark generation + scoring CLI.

Capability parity with reference ``generate_hpsv2.py`` (style-keyed benchmark
generation at :104-192), with the reference's defects fixed (its in-tree
``metrics/sid_hpsv2.py`` scorer is dead code — missing imports, ``len(int)``;
SURVEY.md §2.5):

- prompts come from ``hpsv2.benchmark_prompts('all')`` when the package is
  installed, else from ``--prompts_json`` (``{style: [prompts...]}``) so the
  harness runs offline,
- images are written ``{outdir}/{style}/{seed:05d}.jpg`` exactly like the
  reference so ``hpsv2.evaluate`` consumes them unchanged,
- scoring uses ``hpsv2.evaluate`` when available, else the bundled CLIP
  scorer with HPSv2 weights (``--hps_weights``, open_clip ViT-H checkpoint),
  writing per-style mean scores to ``hpsv2_scores.json``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import click
import numpy as np

from . import parse_int_list
from ..diffusion.rng import StackedRandomGenerator
from ..parallel import runtime


def load_benchmark_prompts(prompts_json: Optional[str]) -> Dict[str, List[str]]:
    try:
        import hpsv2  # type: ignore

        return hpsv2.benchmark_prompts("all")
    except ImportError:
        pass
    if prompts_json and os.path.exists(prompts_json):
        with open(prompts_json, encoding="utf-8") as f:
            return json.load(f)
    raise click.UsageError(
        "hpsv2 package not installed and no --prompts_json given"
    )


def score_images(outdir: str, hps_weights: Optional[str]) -> Dict[str, float]:
    """Score generated style folders; hpsv2.evaluate when available."""
    try:
        import hpsv2  # type: ignore

        hpsv2.evaluate(outdir, hps_version="v2.0")
        return {}
    except ImportError:
        pass
    from PIL import Image

    from ..metrics.detectors import clip_scorer

    scorer = clip_scorer(hps_weights)
    results: Dict[str, float] = {}
    for style in sorted(os.listdir(outdir)):
        style_dir = os.path.join(outdir, style)
        if not os.path.isdir(style_dir):
            continue
        scores: List[float] = []
        files = sorted(f for f in os.listdir(style_dir) if f.endswith((".jpg", ".png")))
        for f in files:
            img = np.asarray(Image.open(os.path.join(style_dir, f)).convert("RGB"))
            prompt_file = os.path.join(style_dir, f.rsplit(".", 1)[0] + ".txt")
            prompt = (
                open(prompt_file, encoding="utf-8").read().strip()
                if os.path.exists(prompt_file)
                else ""
            )
            scores.append(float(np.asarray(scorer.score(img[None], [prompt]))[0]))
        if scores:
            results[style] = float(np.mean(scores))
    with open(os.path.join(outdir, "hpsv2_scores.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


@click.command()
@click.option("--network", "network_path", type=str, default=None)
@click.option("--outdir", type=str, required=True)
@click.option("--subdirs", is_flag=True)
@click.option("--seeds", type=str, default="0-99", show_default=True)
@click.option("--batch", "max_batch_size", type=click.IntRange(min=1), default=16, show_default=True)
@click.option("--num", "max_images", help="Max images per style (reference "
              "generate_hpsv2.py:99 '--num')", type=click.IntRange(min=1),
              default=None)
@click.option("--init_timestep", type=click.IntRange(0, 999), default=625, show_default=True)
@click.option("--repo_id", type=str, default="sd15", show_default=True)
@click.option("--prompts_json", help="Offline {style: [prompts]} file", type=str, default=None)
@click.option("--hps_weights", help="HPSv2 (open_clip ViT-H) weights for offline scoring", type=str, default=None)
@click.option("--use_bf16", type=bool, default=True, show_default=True)
@click.option("--skip_eval", type=bool, default=False, show_default=True)
def main(network_path, outdir, subdirs, seeds, max_batch_size, max_images,
         init_timestep, repo_id, prompts_json, hps_weights, use_bf16,
         skip_eval) -> None:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..pipeline import SDPipeline

    runtime.init_distributed()
    all_prompts = load_benchmark_prompts(prompts_json)
    seed_list = parse_int_list(seeds)
    if max_images is not None:  # global cap, before host striding
        seed_list = seed_list[:max_images]
    pipe = SDPipeline.from_pretrained(
        repo_id, dtype=jnp.bfloat16 if use_bf16 else jnp.float32
    )
    if network_path:
        pipe.load_generator(network_path)
    latent_size = pipe.config.unet.sample_size
    pi, pc = runtime.get_process_index(), runtime.get_process_count()

    for style, prompts in all_prompts.items():
        ids = [s for i, s in enumerate(seed_list) if s < len(prompts) and i % pc == pi]
        runtime.print0(f'Generating {len(ids)} images to "{outdir}/{style}"...')
        for start in range(0, len(ids), max_batch_size):
            batch = ids[start : start + max_batch_size]
            pad = max_batch_size - len(batch)
            padded = batch + batch[:1] * pad
            latents = StackedRandomGenerator(padded).randn(
                (len(padded), latent_size, latent_size, 4)
            )
            images = pipe.generate(
                [prompts[i] for i in padded], latents,
                init_timestep=init_timestep, rng=jax.random.PRNGKey(0),
            )
            for seed, img in list(zip(batch, images))[: len(batch)]:
                d = (
                    os.path.join(outdir, style, f"{seed - seed % 1000:06d}")
                    if subdirs else os.path.join(outdir, style)
                )
                os.makedirs(d, exist_ok=True)
                Image.fromarray(np.asarray(img), "RGB").save(
                    os.path.join(d, f"{seed:05d}.jpg")
                )
                with open(os.path.join(d, f"{seed:05d}.txt"), "w", encoding="utf-8") as f:
                    f.write(prompts[seed])
    runtime.sync_hosts("hpsv2-gen-done")
    if not skip_eval and pi == 0:
        results = score_images(outdir, hps_weights)
        for style, score in results.items():
            print(f"hpsv2[{style}]: {score:.4f}")
    runtime.print0("Done.")


if __name__ == "__main__":
    main()
