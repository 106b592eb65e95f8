"""Metric evaluation CLI: score a generator snapshot on registered metrics.

Plays the role of the reference's eval-only training-loop mode
(``training/sid_training_loop.py:680-745``, driven by
``evaluate_SiD_t2i_coco256.sh``) and of the (google3-broken) ``sid_metrics.py``
EDM evaluator: load a generator checkpoint, run any registered metrics
against a prepared COCO eval folder, write ``metric-*.jsonl`` + ``.txt``
key:value files.
"""

from __future__ import annotations

import os
from typing import Optional

import click

from ..metrics import MetricOptions, calc_metric, list_valid_metrics, report_metric
from ..parallel import runtime


@click.command()
@click.option("--metrics", help="Comma-separated metric names", type=str,
              default="fid_clip_test", show_default=True)
@click.option("--network", "network_path", help="Generator checkpoint", type=str, default=None)
@click.option("--data", "dataset_path", help="Prepared COCO eval folder (img+txt pairs)",
              type=str, required=True)
@click.option("--repo_id", help="Base SD checkpoint dir or preset", type=str,
              default="sd15", show_default=True)
@click.option("--outdir", "run_dir", help="Where to write metric jsonl/txt", type=str, default=".")
@click.option("--num", "num_gen", type=int, default=30000, show_default=True)
@click.option("--batch", "batch_size", type=int, default=16, show_default=True)
@click.option("--init_timestep", type=click.IntRange(0, 999), default=625, show_default=True)
@click.option("--num_steps_eval", type=click.IntRange(min=1), default=1, show_default=True)
@click.option("--resolution", help="Eval resolution (GigaGAN protocol: 256)",
              type=int, default=256, show_default=True)
@click.option("--use_bf16", type=bool, default=True, show_default=True)
@click.option("--inception_weights", type=str, default=None)
@click.option("--clip_weights", type=str, default=None)
@click.option("--hpsv2_prompts", help="{style: [prompts]} json for the hpsv2 metric", type=str, default=None)
@click.option("--list", "list_only", help="List registered metrics and exit", is_flag=True)
def main(
    metrics: str,
    network_path: Optional[str],
    dataset_path: str,
    repo_id: str,
    run_dir: str,
    num_gen: int,
    batch_size: int,
    init_timestep: int,
    num_steps_eval: int,
    resolution: int,
    use_bf16: bool,
    inception_weights: Optional[str],
    clip_weights: Optional[str],
    hpsv2_prompts: Optional[str],
    list_only: bool,
) -> None:
    if list_only:
        for name in list_valid_metrics():
            print(name)
        return
    import jax.numpy as jnp

    from ..metrics.detectors import clip_scorer, inception_detector
    from ..pipeline import SDPipeline

    runtime.init_distributed()
    pipe = SDPipeline.from_pretrained(
        repo_id, dtype=jnp.bfloat16 if use_bf16 else jnp.float32
    )
    if network_path:
        pipe.load_generator(network_path)
    opts = MetricOptions(
        pipe=pipe,
        dataset_path=dataset_path,
        detector=inception_detector(inception_weights),
        clip=clip_scorer(clip_weights) if "clip" in metrics else None,
        batch_size=batch_size,
        num_gen=num_gen,
        init_timestep=init_timestep,
        num_steps_eval=num_steps_eval,
        resolution=resolution,
    )
    if hpsv2_prompts:
        opts.hpsv2_prompts = hpsv2_prompts
    if "hpsv2" in metrics and opts.clip is None:
        opts.clip = clip_scorer(clip_weights)
    os.makedirs(run_dir, exist_ok=True)
    for metric in metrics.split(","):
        result = calc_metric(metric.strip(), opts=opts)
        if runtime.get_process_index() == 0:
            report_metric(result, run_dir=run_dir, snapshot_pkl=network_path)
            for key, value in result.results.items():
                with open(os.path.join(run_dir, f"{key}.txt"), "at") as f:
                    f.write(f"{key}: {value}\n")


if __name__ == "__main__":
    main()
