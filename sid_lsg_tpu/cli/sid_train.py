"""Distillation training CLI.

Flag surface mirrors reference ``sid_train.py:88-158`` (same names where the
concept survives: --data --batch --glr --lr --ema --tick --snap --dump --seed
--ls --lsg --cfg_train_fake/--cfg_eval_fake/--cfg_eval_real --init_timestep
--tmin/--tmax --alpha --num_steps --resume --dry-run), with TPU-native
replacements: --batch-micro instead of per-GPU --batch-gpu, --bf16 instead of
--fp16, --fsdp for sharded optimizer/param state, --grad-ckpt for remat.

Run dirs are numbered ``{id:05d}-{desc}`` with ``training_options.json`` +
``log.txt`` inside (reference sid_train.py:286-311,362-368).
"""

from __future__ import annotations

import json
import os

import click

from ..parallel import runtime
from ..training.loop import TrainConfig, training_loop
from ..utils.util import Logger, make_run_dir


@click.command()
@click.option("--outdir", help="Where to save the results", type=str, required=True)
@click.option("--data", help="Prompt corpus file/dir (Aesthetics6+ txt)", type=str, default="")
@click.option("--sd_model", help="Teacher: preset (sd15/sd21base/tiny) or checkpoint dir", type=str, default="sd15", show_default=True)
@click.option("--prediction_type", type=click.Choice(["epsilon", "v_prediction"]), default=None)
@click.option("--duration", help="Training duration (kimg)", type=int, default=200000, show_default=True)
@click.option("--batch", help="Global batch size", type=int, default=512, show_default=True)
@click.option("--batch-micro", "batch_micro", help="Global batch per accumulation round", type=int, default=8, show_default=True)
@click.option("--glr", help="Generator learning rate", type=float, default=1e-6, show_default=True)
@click.option("--lr", help="Fake-score learning rate", type=float, default=1e-6, show_default=True)
@click.option("--optimizer", type=click.Choice(["adam", "adamw"]), default="adam",
              show_default=True, help="reference sid_train.py:155")
@click.option("--weight_decay", type=float, default=0.01, show_default=True,
              help="AdamW decoupled decay (only with --optimizer adamw)")
@click.option("--nosubdir", is_flag=True,
              help="Run directly in --outdir (reference sid_train.py:111)")
@click.option("--ema", "ema_halflife_kimg", help="EMA half-life (kimg)", type=float, default=500, show_default=True)
@click.option("--tick", "kimg_per_tick", help="Progress interval (kimg)", type=int, default=50, show_default=True)
@click.option("--snap", "snapshot_ticks", help="Snapshot interval (ticks)", type=int, default=50, show_default=True)
@click.option("--dump", "state_dump_ticks", help="State dump interval (ticks)", type=int, default=500, show_default=True)
@click.option("--seed", type=int, default=0, show_default=True)
@click.option("--ls", "loss_scaling", type=float, default=1.0, show_default=True)
@click.option("--lsg", "loss_scaling_g", type=float, default=1.0, show_default=True)
@click.option("--cfg_train_fake", help="kappa1", type=float, default=1.0, show_default=True)
@click.option("--cfg_eval_fake", help="kappa2=kappa3", type=float, default=1.0, show_default=True)
@click.option("--cfg_eval_real", help="kappa4", type=float, default=1.0, show_default=True)
@click.option("--init_timestep", type=click.IntRange(0, 999), default=625, show_default=True)
@click.option("--tmin", type=int, default=20, show_default=True)
@click.option("--tmax", type=int, default=980, show_default=True)
@click.option("--alpha", type=float, default=1.0, show_default=True)
@click.option("--num_steps", type=int, default=1, show_default=True)
@click.option("--bf16", "use_bf16", type=bool, default=True, show_default=True)
@click.option("--grad-ckpt", "gradient_checkpointing", type=bool, default=False, show_default=True)
@click.option("--teacher-bf16", "teacher_bf16", type=bool, default=False, show_default=True,
              help="Store the frozen teacher in bf16 (frees ~1.7 GB at SD1.5 width; "
                   "a no-op numerically under bf16 compute)")
@click.option("--lowmem-opt", "low_mem_opt", type=bool, default=False, show_default=True,
              help="Low-memory Adam state (no mu at b1=0, bf16 nu)")
@click.option("--fake_score_use_lora", type=bool, default=False, show_default=True)
@click.option("--adv_weight_d", "adv_weight_d", help="SiDA discriminator loss weight (0 = plain SiD-LSG)", type=float, default=0.0, show_default=True)
@click.option("--adv_weight_g", "adv_weight_g", help="SiDA generator adversarial loss weight", type=float, default=0.0, show_default=True)
@click.option("--gan_loss", type=click.Choice(["ns", "hinge"]), default="ns", show_default=True)
@click.option("--adv_data", help="encode_latents npz of real latents+captions (SiDA)", type=str, default=None)
@click.option("--adv_tower", type=click.Choice(["encoder", "dino"]), default="encoder", show_default=True,
              help="Discriminator: 'encoder' = psi's encoder on noised latents (zero extra params); 'dino' = projected StyleGAN-T D on VAE-decoded pixels (frozen DINO + trainable spectral heads)")
@click.option("--adv_dino", help="timm/dino ViT-S/16 state dict for --adv_tower dino (random init if unset — smoke only)", type=str, default=None)
@click.option("--adv_vit", type=click.Choice(["s16", "tiny"]), default="s16", show_default=True,
              help="DINO backbone config for --adv_tower dino ('tiny' = tests/smoke)")
@click.option("--remat-policy", "remat_policy", type=click.Choice(["full", "dots", "dots_no_batch", "attn", "attn_offload", "flash"]), default="full", show_default=True,
              help="'flash' (save the attention kernel outputs; skips the backward-sweep kernel recompute) is the measured production recipe — BENCH_NOTES.md")
@click.option("--lora_rank", type=int, default=4, show_default=True)
@click.option("--fsdp", help="FSDP axis size (1 = pure data parallel)", type=int, default=1, show_default=True)
@click.option("--resolution", type=int, default=512, show_default=True)
@click.option("--metrics", help="Comma-separated metric names to run at snapshot ticks", type=str, default=None)
@click.option("--metric_data", help="Prepared COCO eval folder for metrics", type=str, default=None)
@click.option("--resume", help="'latest' or a generator checkpoint path", type=str, default=None)
@click.option("--resume_kimg", type=int, default=0)
@click.option("--desc", help="Run-dir description suffix", type=str, default=None)
@click.option("--max-ticks", "max_ticks", help="Stop after N ticks (smoke runs)", type=int, default=None)
@click.option("--profile-dir", "profile_dir", help="Capture a jax profiler trace of a few steps here", type=str, default=None)
@click.option("--dry-run", "dry_run", help="Print options and exit", is_flag=True)
def main(**opts) -> None:
    # Must precede the first JAX backend query (the process_index calls
    # below): jax.distributed.initialize rejects an already-initialised
    # backend.  No-op single-process.
    runtime.init_distributed()
    dataset_name = (
        os.path.splitext(os.path.basename(opts["data"]))[0] if opts["data"] else "synthetic"
    )
    desc = (
        f"{dataset_name:s}-{opts['sd_model'].split('/')[-1]}"
        f"-glr{opts['glr']:g}-lr{opts['lr']:g}"
        f"-kappa{opts['cfg_eval_real']:g}-alpha{opts['alpha']:g}"
        f"-batch{opts['batch']:d}"
    )
    if opts["desc"]:
        desc += f"-{opts['desc']}"

    cfg = TrainConfig(
        run_dir="",  # assigned below
        data=opts["data"],
        model=opts["sd_model"],
        prediction_type=opts["prediction_type"],
        resolution=opts["resolution"],
        batch_size=opts["batch"],
        microbatch=opts["batch_micro"],
        glr=opts["glr"],
        lr=opts["lr"],
        optimizer=opts["optimizer"],
        weight_decay=opts["weight_decay"],
        cfg_train_fake=opts["cfg_train_fake"],
        cfg_eval_fake=opts["cfg_eval_fake"],
        cfg_eval_real=opts["cfg_eval_real"],
        init_timestep=opts["init_timestep"],
        tmin=opts["tmin"],
        tmax=opts["tmax"],
        alpha=opts["alpha"],
        loss_scaling=opts["loss_scaling"],
        loss_scaling_G=opts["loss_scaling_g"],
        num_steps=opts["num_steps"],
        ema_halflife_kimg=opts["ema_halflife_kimg"],
        total_kimg=opts["duration"],
        kimg_per_tick=opts["kimg_per_tick"],
        snapshot_ticks=opts["snapshot_ticks"],
        state_dump_ticks=opts["state_dump_ticks"],
        seed=opts["seed"],
        use_bf16=opts["use_bf16"],
        gradient_checkpointing=opts["gradient_checkpointing"],
        remat_policy=opts["remat_policy"],
        adv_weight_D=opts["adv_weight_d"],
        adv_weight_G=opts["adv_weight_g"],
        gan_loss=opts["gan_loss"],
        adv_data=opts["adv_data"],
        adv_tower=opts["adv_tower"],
        adv_dino=opts["adv_dino"],
        adv_vit=opts["adv_vit"],
        low_mem_opt=opts["low_mem_opt"],
        teacher_bf16=opts["teacher_bf16"],
        fake_score_use_lora=opts["fake_score_use_lora"],
        lora_rank=opts["lora_rank"],
        fsdp=opts["fsdp"],
        metrics=opts["metrics"].split(",") if opts["metrics"] else None,
        metric_data=opts["metric_data"],
        resume=opts["resume"],
        resume_kimg=opts["resume_kimg"],
        max_ticks=opts["max_ticks"],
        profile_dir=opts["profile_dir"],
    )

    if opts["dry_run"]:
        print("Training options:")
        print(cfg.as_json())
        print(f"Output directory would be: {opts['outdir']}/<id>-{desc}")
        print("Dry run; exiting.")
        return

    # Host 0 allocates the numbered run dir; other hosts (shared filesystem)
    # resolve the same path after the barrier — orbax multi-host saves need
    # every process to address one directory.
    if opts["nosubdir"]:
        cfg.run_dir = opts["outdir"]
        if runtime.get_process_index() == 0:
            os.makedirs(cfg.run_dir, exist_ok=True)
        runtime.sync_hosts("run-dir")
    else:
        if runtime.get_process_index() == 0:
            cfg.run_dir = make_run_dir(opts["outdir"], desc)
        runtime.sync_hosts("run-dir")
        if runtime.get_process_index() != 0:
            candidates = sorted(
                d for d in os.listdir(opts["outdir"]) if d.endswith(f"-{desc}")
            )
            cfg.run_dir = os.path.join(opts["outdir"], candidates[-1])
    logger = Logger(
        os.path.join(cfg.run_dir, "log.txt")
        if runtime.get_process_index() == 0
        else None,
        "a",
    )
    try:
        print(f"Output directory: {cfg.run_dir}")
        print("Training options:")
        print(cfg.as_json())
        training_loop(cfg)
    finally:
        logger.close()


if __name__ == "__main__":
    main()
