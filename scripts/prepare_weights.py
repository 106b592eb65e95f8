"""Real-weights readiness kit: one command per weight artifact.

The container has zero egress, so published weights cannot be fetched here —
but the moment they arrive locally, each subcommand converts + validates them
into the formats this framework loads, and ``golden`` reproduces the
reference's fixed-seed quality contract (README.md:139-157 golden images,
generate_onestep.py:164-212 reproduction commands).

    # HF-layout SD checkpoint dir (unet/ vae/ text_encoder/ tokenizer/)
    python scripts/prepare_weights.py sd --src /path/sd15 [--smoke]

    # NVIDIA TorchScript InceptionV3 (FID detector, sid_metric_utils.py:98)
    python scripts/prepare_weights.py inception --src inception-2015-12-05.pt \
        --out weights/inception.pt       # then: export SIDLSG_INCEPTION_WEIGHTS=...

    # open_clip ViT-g-14 checkpoint (CLIP score, sid_metric_utils.py:36)
    python scripts/prepare_weights.py clip --src vit_g14_laion2b.bin \
        --out weights/clip_vit_g14.pt    # then: export SIDLSG_CLIP_WEIGHTS=...

    # Reference SiD-LSG snapshot ({'ema': unet}, sid_training_loop.py:641-651)
    python scripts/prepare_weights.py snapshot --src network-snapshot.pkl \
        --out weights/generator.safetensors

    # Fixed-seed golden grid: reproduce, and compare against fixtures if given
    python scripts/prepare_weights.py golden --model /path/sd15 \
        --network weights/generator.safetensors --out /tmp/golden \
        [--fixtures tests/fixtures/golden_sd15]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np

# The reference's golden contract: seeds are caption indices
# (generate_onestep.py:228-232); grids use a fixed seed list.
GOLDEN_SEEDS = tuple(range(8))
GOLDEN_INIT_TIMESTEP = 625


@click.group()
def cli():
    pass


@cli.command("sd")
@click.option("--src", required=True, help="HF-layout SD checkpoint directory")
@click.option("--smoke", is_flag=True, help="run a 2-image generation smoke")
def sd_cmd(src, smoke):
    """Validate + convert a local SD1.5/SD2.1-base checkpoint dir."""
    import jax.numpy as jnp

    from sid_lsg_tpu.pipeline import SDPipeline

    pipe = SDPipeline.from_pretrained(src, dtype=jnp.float32)
    n = sum(
        int(np.prod(np.shape(p)))
        for part in ("unet", "vae", "text")
        for p in __import__("jax").tree_util.tree_leaves(pipe.params[part])
    )
    print(f"ok: {pipe.config.name} loaded from {src} ({n/1e6:.0f}M params)")
    if smoke:
        import jax

        z = jax.random.normal(jax.random.PRNGKey(0), (2, pipe.config.unet.sample_size,
                                                      pipe.config.unet.sample_size, 4))
        imgs = pipe.generate(["a photograph of an astronaut riding a horse"] * 2, z)
        print(f"smoke ok: generated {imgs.shape} uint8, mean {imgs.mean():.1f}")


@cli.command("inception")
@click.option("--src", required=True, help="TorchScript or state-dict InceptionV3 file")
@click.option("--out", required=True, help="output weights file (.pt)")
def inception_cmd(src, out):
    """Convert the FID detector weights and validate the feature head."""
    import torch

    from sid_lsg_tpu.models.inception import InceptionV3Features, convert_inception

    try:  # NVIDIA's detector ships as TorchScript (sid_metric_utils.py:98)
        sd = {k: v for k, v in torch.jit.load(src, map_location="cpu").state_dict().items()}
    except Exception:
        sd = torch.load(src, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    sd = {k: torch.as_tensor(v) for k, v in sd.items()}
    params = convert_inception({k: v.float().numpy() for k, v in sd.items()})
    import jax
    import jax.numpy as jnp

    feats = InceptionV3Features().apply(
        {"params": params}, jnp.zeros((1, 299, 299, 3), jnp.uint8)
    )
    assert feats.shape == (1, 2048) and bool(jnp.all(jnp.isfinite(feats)))
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    torch.save({k: v for k, v in sd.items()}, out)
    print(f"ok: wrote {out}; export SIDLSG_INCEPTION_WEIGHTS={os.path.abspath(out)}")


@cli.command("clip")
@click.option("--src", required=True, help="open_clip ViT-g-14 checkpoint")
@click.option("--out", required=True, help="output weights file (.pt)")
def clip_cmd(src, out):
    """Convert the CLIP-score tower weights and validate the towers."""
    import torch

    from sid_lsg_tpu.models.clip_vision import VIT_G_14, CLIPScorer, convert_open_clip
    from sid_lsg_tpu.models.convert import load_torch_state_dict

    sd = load_torch_state_dict(src)
    params = convert_open_clip(sd, VIT_G_14)
    scorer = CLIPScorer(VIT_G_14, params=params)
    import numpy as np

    s = scorer.score(np.zeros((1, 64, 64, 3), np.uint8), ["a cat"])
    assert np.isfinite(s).all()
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()}, out)
    print(f"ok: wrote {out}; export SIDLSG_CLIP_WEIGHTS={os.path.abspath(out)}")


@cli.command("dino")
@click.option("--src", required=True, help="timm/dino ViT-S/16 checkpoint (e.g. dino_deitsmall16_pretrain.pth)")
@click.option("--out", required=True, help="output weights file (.pt)")
def dino_cmd(src, out):
    """Convert + validate the DINO backbone for `sid-train --adv_tower dino`."""
    import numpy as np
    import torch

    from sid_lsg_tpu.models.convert import load_torch_state_dict
    from sid_lsg_tpu.models.stylegan_discriminator import (
        DINO_VIT_S16, DINOViT, convert_dino,
    )

    sd = load_torch_state_dict(src)
    params = convert_dino(sd, DINO_VIT_S16)
    vit = DINOViT(DINO_VIT_S16)
    feats = vit.apply({"params": params},
                      np.zeros((1, 224, 224, 3), np.float32))
    assert len(feats) == vit.n_hooks
    for v in feats.values():
        assert np.isfinite(np.asarray(v)).all()
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    torch.save({k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}, out)
    print(f"ok: wrote {out}; pass it to sid-train --adv_tower dino --adv_dino {os.path.abspath(out)}")


@cli.command("snapshot")
@click.option("--src", required=True, help="reference network-snapshot-*.pkl")
@click.option("--out", required=True, help="output generator .safetensors")
@click.option("--config", "config_name", default="sd15", show_default=True)
def snapshot_cmd(src, out, config_name):
    """Reference EMA pickle -> framework generator safetensors."""
    from sid_lsg_tpu.models.configs import resolve
    from sid_lsg_tpu.runtime.checkpoint import export_generator, load_generator_params

    cfg = resolve(config_name)
    params = load_generator_params(src, cfg.unet)
    export_generator(params, out)
    print(f"ok: wrote {out}")


@cli.command("golden")
@click.option("--model", required=True, help="SD checkpoint dir or preset")
@click.option("--network", default=None, help="distilled generator checkpoint")
@click.option("--prompts", "prompts_path", default="prompts/example_prompts.txt",
              show_default=True)
@click.option("--out", required=True, help="output dir for the grid + npz")
@click.option("--fixtures", default=None,
              help="fixture dir with golden.npz to compare against")
@click.option("--tolerance", default=2.0, show_default=True,
              help="max mean |uint8 delta| per image vs fixtures")
def golden_cmd(model, network, prompts_path, out, fixtures, tolerance):
    """Reproduce the fixed-seed golden grid; compare to fixtures if given.

    Determinism contract: image i is a pure function of (weights, seed i,
    caption i mod len, init_timestep), matching the reference's
    StackedRandomGenerator semantics (generate_onestep.py:30-44,285-292).
    """
    import jax.numpy as jnp

    from sid_lsg_tpu.cli.generate_onestep import compress_to_npz, generate_images
    from sid_lsg_tpu.data.prompts import read_prompt_file
    from sid_lsg_tpu.pipeline import SDPipeline

    pipe = SDPipeline.from_pretrained(model, dtype=jnp.float32)
    if network:
        pipe.load_generator(network)
    captions = read_prompt_file(prompts_path) if os.path.exists(prompts_path) else [""]
    os.makedirs(out, exist_ok=True)
    generate_images(
        pipe, captions, list(GOLDEN_SEEDS), out,
        max_batch_size=len(GOLDEN_SEEDS), init_timestep=GOLDEN_INIT_TIMESTEP,
        num_steps_eval=1, custom_seed=True,
    )
    compress_to_npz(out, len(GOLDEN_SEEDS))
    got = np.load(out + ".npz")["arr_0"]
    report = {"seeds": list(GOLDEN_SEEDS), "shape": list(got.shape)}
    if fixtures:
        want = np.load(os.path.join(fixtures, "golden.npz"))["arr_0"]
        assert want.shape == got.shape, (want.shape, got.shape)
        delta = np.abs(got.astype(np.int32) - want.astype(np.int32))
        per_img = delta.reshape(delta.shape[0], -1).mean(axis=1)
        report["mean_abs_delta_per_image"] = [round(float(d), 3) for d in per_img]
        ok = bool((per_img <= tolerance).all())
        report["pass"] = ok
        print(json.dumps(report))
        if not ok:
            raise SystemExit(1)
    else:
        print(json.dumps(report))
        print(f"no fixtures given; save {out}.npz as golden.npz to pin this output")


if __name__ == "__main__":
    cli()
