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

    from sid_lsg_tpu.models.clip_vision import (
        CLIPScorer, config_from_open_clip, convert_open_clip,
    )
    from sid_lsg_tpu.models.convert import load_torch_state_dict

    sd = load_torch_state_dict(src)
    # Derive the tower from the checkpoint's own shapes (ViT-g-14 for the
    # metric detector, but also ViT-H-14 / test towers) — same path as
    # metrics/detectors.clip_scorer.
    cfg = config_from_open_clip(sd)
    params = convert_open_clip(sd, cfg)
    scorer = CLIPScorer(cfg, params=params)
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


# ---------------------------------------------------------------------------
# One-command weights day (VERDICT r4 #6): orchestrate the whole 8-step
# runbook (TODO.md) in order from a single artifact root.


def _find_file(root, patterns, what, explicit=None, required=True):
    """Resolve one artifact: explicit path wins, else glob under root."""
    import glob as _glob

    if explicit:
        if not os.path.exists(explicit):
            raise click.ClickException(f"--{what} {explicit!r} not found")
        return explicit
    hits = []
    for pat in patterns:
        hits += _glob.glob(os.path.join(root, pat))
        hits += _glob.glob(os.path.join(root, "**", pat), recursive=True)
    hits = sorted(set(h for h in hits if os.path.isfile(h)))
    if not hits:
        if required:
            raise click.ClickException(
                f"no {what} found under {root} (patterns {list(patterns)}); "
                f"pass --{what} explicitly"
            )
        return None
    return hits[0]


def _find_sd_dir(root, explicit=None):
    """An HF-layout SD checkpoint dir = contains unet/ and vae/ subdirs."""
    if explicit:
        if not os.path.isdir(os.path.join(explicit, "unet")):
            raise click.ClickException(f"--sd {explicit!r} has no unet/ subdir")
        return explicit
    for dirpath, dirnames, _ in os.walk(root):
        if "unet" in dirnames and "vae" in dirnames:
            return dirpath
    raise click.ClickException(
        f"no HF-layout SD dir (unet/ + vae/) found under {root}; pass --sd"
    )


@cli.command("all")
@click.option("--src", required=True, help="root dir holding the downloaded artifacts")
@click.option("--outdir", default="weights", show_default=True,
              help="where converted weights + pinned goldens land")
@click.option("--sd", "sd_path", default=None,
              help="HF-layout SD dir (default: auto-detect under --src)")
@click.option("--inception", "inception_path", default=None)
@click.option("--clip", "clip_path", default=None)
@click.option("--dino", "dino_path", default=None,
              help="DINO ViT-S/16 checkpoint (optional; SiDA only)")
@click.option("--snapshot", "snapshot_path", default=None,
              help="reference network-snapshot-*.pkl (optional; teacher-only "
                   "golden without it)")
@click.option("--config", "config_name", default="sd15", show_default=True,
              help="UNet config for the snapshot conversion")
@click.option("--skip-pytest", is_flag=True,
              help="skip the detector-parity pytest leg (tests/test_real_weights.py)")
@click.option("--fid-smoke/--no-fid-smoke", default=True, show_default=True,
              help="self-FID over the golden grid through the converted "
                   "Inception detector (must be ~0)")
def all_cmd(src, outdir, sd_path, inception_path, clip_path, dino_path,
            snapshot_path, config_name, skip_pytest, fid_smoke):
    """Weights day in ONE command: run the 8-step runbook (TODO.md) in order.

    sd load+smoke -> inception/clip[/dino] conversion -> snapshot ->
    golden grid + fixture pinning -> detector-parity pytest -> FID smoke.
    Detector-output parity runs BEFORE any FID is trusted (the NVIDIA
    TorchScript detector embeds its own preprocessing — runbook step 7).
    Prints the export lines to persist the env wiring for later sessions.
    """
    import subprocess

    os.makedirs(outdir, exist_ok=True)
    steps = []
    env_vars = {}

    # 1. sd: load + generation smoke
    sd_dir = _find_sd_dir(src, sd_path)
    sd_cmd.callback(src=sd_dir, smoke=True)
    env_vars["SIDLSG_SD15_DIR"] = os.path.abspath(sd_dir)
    steps.append("sd")

    # 2-3. detectors
    inc_src = _find_file(src, ("*inception*.pt", "*inception*.pkl"),
                         "inception", inception_path)
    inc_out = os.path.join(outdir, "inception.pt")
    inception_cmd.callback(src=inc_src, out=inc_out)
    env_vars["SIDLSG_INCEPTION_WEIGHTS"] = os.path.abspath(inc_out)
    steps.append("inception")

    clip_src = _find_file(
        src, ("*clip*.pt", "*clip*.bin", "*ViT-g-14*", "*vit_g14*"),
        "clip", clip_path)
    clip_out = os.path.join(outdir, "clip_vit_g14.pt")
    clip_cmd.callback(src=clip_src, out=clip_out)
    env_vars["SIDLSG_CLIP_WEIGHTS"] = os.path.abspath(clip_out)
    steps.append("clip")

    # 4. dino (SiDA only — skip cleanly when absent)
    dino_src = _find_file(src, ("*dino*.pth", "*dino*.pt"), "dino",
                          dino_path, required=False)
    if dino_src:
        dino_cmd.callback(src=dino_src, out=os.path.join(outdir, "dino.pt"))
        steps.append("dino")

    # 5. snapshot -> generator safetensors (teacher-only golden without it)
    gen_st = None
    snap_src = _find_file(src, ("network-snapshot*.pkl",), "snapshot",
                          snapshot_path, required=False)
    if snap_src:
        gen_st = os.path.join(outdir, "generator.safetensors")
        snapshot_cmd.callback(src=snap_src, out=gen_st, config_name=config_name)
        env_vars["SIDLSG_SNAPSHOT_PKL"] = os.path.abspath(snap_src)
        steps.append("snapshot")

    # 6. golden grid, then pin it as the fixture for future sessions
    golden_out = os.path.join(outdir, "golden")
    golden_cmd.callback(model=sd_dir, network=gen_st,
                        prompts_path="prompts/example_prompts.txt",
                        out=golden_out, fixtures=None, tolerance=2.0)
    fixdir = os.path.join(outdir, "golden_fixtures")
    os.makedirs(fixdir, exist_ok=True)
    import shutil

    shutil.copy(golden_out + ".npz", os.path.join(fixdir, "golden.npz"))
    env_vars["SIDLSG_GOLDEN_FIXTURES"] = os.path.abspath(fixdir)
    steps.append("golden+pin")

    # 7. detector-output parity FIRST (before trusting any FID): the
    #    env-gated real-weights suite, now fully un-gated by the env above.
    if not skip_pytest:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/test_real_weights.py",
             "-q", "-p", "no:cacheprovider"],
            cwd=repo, env={**os.environ, **env_vars},
        )
        if r.returncode != 0:
            raise SystemExit(f"detector-parity pytest failed rc={r.returncode}")
        steps.append("pytest")

    # 8. FID smoke: golden set against itself through the REAL converted
    #    detector — exercises detector + stats + matrix-sqrt end-to-end and
    #    must come out ~0.
    fid = None
    if fid_smoke:
        from sid_lsg_tpu.metrics.detectors import inception_detector
        from sid_lsg_tpu.metrics.feature_stats import FeatureStats
        from sid_lsg_tpu.metrics.fid import compute_fid_from_stats

        imgs = np.load(golden_out + ".npz")["arr_0"]
        feats = np.asarray(inception_detector(inc_out)(imgs))
        stats = FeatureStats(capture_mean_cov=True)
        stats.append(feats)
        fid = compute_fid_from_stats(stats, stats)
        assert abs(fid) < 0.5, f"self-FID {fid} not ~0 — detector/stats broken"
        steps.append("fid-smoke")

    print(json.dumps({"all": "pass", "steps": steps,
                      "fid_smoke": None if fid is None else round(float(fid), 6)}))
    print("# persist the wiring for later sessions:")
    for k, v in env_vars.items():
        print(f"export {k}={v}")


# ---------------------------------------------------------------------------
# Readiness drill: every subcommand end-to-end on synthetic artifact-shaped
# inputs, so the first session that has real weights spends its time on FID,
# not plumbing.


def _synth_inception_pt(path: str, rng: np.random.RandomState) -> None:
    """Random torch state dict with the exact torchvision/pytorch-fid key
    layout ``convert_inception`` folds (<block>.conv.weight + bn stats),
    derived from the Flax module's own tree so it can never drift."""
    import torch

    from sid_lsg_tpu.models.inception import load_inception_params

    sd = {}

    def walk(node, prefix):
        for k, v in node.items():
            if k == "conv" and isinstance(v, dict) and "kernel" in v:
                h, w, i, o = np.shape(v["kernel"])
                sd[prefix + "conv.weight"] = rng.randn(o, i, h, w).astype(np.float32) * 0.05
                sd[prefix + "bn.weight"] = (rng.rand(o) * 0.5 + 0.75).astype(np.float32)
                sd[prefix + "bn.bias"] = rng.randn(o).astype(np.float32) * 0.1
                sd[prefix + "bn.running_mean"] = rng.randn(o).astype(np.float32) * 0.1
                sd[prefix + "bn.running_var"] = (rng.rand(o) * 0.5 + 0.75).astype(np.float32)
            elif isinstance(v, dict):
                walk(v, prefix + k + ".")

    walk(load_inception_params(), "")
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()}, path)


def _synth_open_clip_pt(path: str, rng: np.random.RandomState) -> None:
    """Random open_clip-layout checkpoint (tiny tower, REAL 49408-token vocab
    so the BPE tokenizer ids stay in range); ``config_from_open_clip`` must
    round-trip its shapes."""
    import torch

    w, tw, layers, patch, img, inter, proj = 32, 32, 2, 8, 32, 64, 16
    vocab, max_pos = 49408, 77
    r = lambda *s: rng.randn(*s).astype(np.float32) * 0.02
    ones = lambda n: np.ones((n,), np.float32)
    zeros = lambda n: np.zeros((n,), np.float32)
    sd = {
        "visual.conv1.weight": r(w, 3, patch, patch),
        "visual.class_embedding": r(w),
        "visual.positional_embedding": r((img // patch) ** 2 + 1, w),
        "visual.ln_pre.weight": ones(w), "visual.ln_pre.bias": zeros(w),
        "visual.ln_post.weight": ones(w), "visual.ln_post.bias": zeros(w),
        "visual.proj": r(w, proj),
        "token_embedding.weight": r(vocab, tw),
        "positional_embedding": r(max_pos, tw),
        "ln_final.weight": ones(tw), "ln_final.bias": zeros(tw),
        "text_projection": r(tw, proj),
        "logit_scale": np.float32(4.6),
    }
    for tower, width in (("visual.transformer", w), ("transformer", tw)):
        for i in range(layers):
            p = f"{tower}.resblocks.{i}"
            sd.update({
                f"{p}.ln_1.weight": ones(width), f"{p}.ln_1.bias": zeros(width),
                f"{p}.ln_2.weight": ones(width), f"{p}.ln_2.bias": zeros(width),
                f"{p}.attn.in_proj_weight": r(3 * width, width),
                f"{p}.attn.in_proj_bias": zeros(3 * width),
                f"{p}.attn.out_proj.weight": r(width, width),
                f"{p}.attn.out_proj.bias": zeros(width),
                f"{p}.mlp.c_fc.weight": r(inter, width),
                f"{p}.mlp.c_fc.bias": zeros(inter),
                f"{p}.mlp.c_proj.weight": r(width, inter),
                f"{p}.mlp.c_proj.bias": zeros(width),
            })
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()}, path)


def _synth_dino_pth(path: str, rng: np.random.RandomState) -> None:
    """Random timm/dino-layout ViT-S/16 checkpoint at the REAL shapes
    (width 384, 12 layers) — the config ``dino_cmd`` validates against."""
    import torch

    from sid_lsg_tpu.models.stylegan_discriminator import DINO_VIT_S16 as cfg

    c = cfg.width
    n_tok = (cfg.image_size // cfg.patch_size) ** 2
    r = lambda *s: rng.randn(*s).astype(np.float32) * 0.02
    sd = {
        "patch_embed.proj.weight": r(c, 3, cfg.patch_size, cfg.patch_size),
        "patch_embed.proj.bias": r(c),
        "cls_token": r(1, 1, c),
        "pos_embed": r(1, n_tok + 1, c),
    }
    for i in range(cfg.layers):
        sd.update({
            f"blocks.{i}.norm1.weight": np.ones((c,), np.float32),
            f"blocks.{i}.norm1.bias": np.zeros((c,), np.float32),
            f"blocks.{i}.norm2.weight": np.ones((c,), np.float32),
            f"blocks.{i}.norm2.bias": np.zeros((c,), np.float32),
            f"blocks.{i}.attn.qkv.weight": r(3 * c, c),
            f"blocks.{i}.attn.qkv.bias": np.zeros((3 * c,), np.float32),
            f"blocks.{i}.attn.proj.weight": r(c, c),
            f"blocks.{i}.attn.proj.bias": np.zeros((c,), np.float32),
            f"blocks.{i}.mlp.fc1.weight": r(4 * c, c),
            f"blocks.{i}.mlp.fc1.bias": np.zeros((4 * c,), np.float32),
            f"blocks.{i}.mlp.fc2.weight": r(c, 4 * c),
            f"blocks.{i}.mlp.fc2.bias": np.zeros((c,), np.float32),
        })
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()}, path)


def _synth_snapshot_pkl(path: str, ckpt_dir: str) -> None:
    """Reference-shaped ``{'ema': state_dict}`` torch pickle assembled from
    the committed tiny HF fixture's unet (diffusers key layout, the layout
    ``convert_unet`` consumes — reference sid_training_loop.py:641-651)."""
    import torch
    from safetensors import safe_open

    sd = {}
    with safe_open(os.path.join(ckpt_dir, "unet",
                                "diffusion_pytorch_model.safetensors"),
                   framework="np") as f:
        for k in f.keys():
            sd[k] = torch.as_tensor(np.asarray(f.get_tensor(k), np.float32))
    torch.save({"ema": sd}, path)


@cli.command("verify")
@click.option("--workdir", default=None,
              help="scratch dir (default: a fresh temp dir)")
@click.option("--fixture", default="tests/fixtures/tiny_hf_ckpt",
              show_default=True, help="committed tiny HF-layout checkpoint")
def verify_cmd(workdir, fixture):
    """Weights-arrival readiness drill: run EVERY subcommand end-to-end on
    synthetic inputs shaped exactly like the real artifacts (VERDICT r3 #10).

    Exercises: sd (load + generation smoke), inception/clip/dino (synthetic
    torch checkpoints through convert + validate + save, then the
    metrics/detectors env-var consumer path), snapshot (reference {'ema': ...}
    pickle -> safetensors), and golden (grid reproduction + fixture compare
    against its own output).  Passing means weights day is FID day.
    """
    import tempfile

    workdir = workdir or tempfile.mkdtemp(prefix="sidlsg_weights_drill_")
    os.makedirs(workdir, exist_ok=True)
    rng = np.random.RandomState(0)
    steps = []

    # 1. sd: committed HF-layout fixture + generation smoke
    sd_cmd.callback(src=fixture, smoke=True)
    steps.append("sd")

    # 2. inception: synthetic torch ckpt -> convert/validate/save -> detector
    inc_src = os.path.join(workdir, "inception_synth.pt")
    inc_out = os.path.join(workdir, "weights", "inception.pt")
    _synth_inception_pt(inc_src, rng)
    inception_cmd.callback(src=inc_src, out=inc_out)
    from sid_lsg_tpu.metrics.detectors import inception_detector

    feats = inception_detector(inc_out)(np.zeros((1, 64, 64, 3), np.uint8))
    assert feats.shape == (1, 2048) and np.isfinite(feats).all()
    steps.append("inception")

    # 3. clip: synthetic open_clip ckpt -> convert/validate/save -> scorer
    clip_src = os.path.join(workdir, "clip_synth.pt")
    clip_out = os.path.join(workdir, "weights", "clip.pt")
    _synth_open_clip_pt(clip_src, rng)
    clip_cmd.callback(src=clip_src, out=clip_out)
    from sid_lsg_tpu.metrics.detectors import clip_scorer

    s = clip_scorer(clip_out).score(np.zeros((1, 64, 64, 3), np.uint8), ["a cat"])
    assert np.isfinite(np.asarray(s)).all()
    steps.append("clip")

    # 4. dino: synthetic timm-layout ckpt at real ViT-S/16 shapes
    dino_src = os.path.join(workdir, "dino_synth.pth")
    dino_out = os.path.join(workdir, "weights", "dino.pt")
    _synth_dino_pth(dino_src, rng)
    dino_cmd.callback(src=dino_src, out=dino_out)
    steps.append("dino")

    # 5. snapshot: reference {'ema': ...} pickle -> generator safetensors
    snap_src = os.path.join(workdir, "network-snapshot-synth.pkl")
    snap_out = os.path.join(workdir, "weights", "generator.safetensors")
    _synth_snapshot_pkl(snap_src, fixture)
    snapshot_cmd.callback(src=snap_src, out=snap_out, config_name="tiny")
    steps.append("snapshot")

    # 6. golden: reproduce the grid, then compare against its own output
    #    (exercises the fixture-compare path with a guaranteed-pass fixture).
    g1 = os.path.join(workdir, "golden_run")
    golden_cmd.callback(model=fixture, network=snap_out,
                        prompts_path="prompts/example_prompts.txt",
                        out=g1, fixtures=None, tolerance=2.0)
    fixdir = os.path.join(workdir, "golden_fix")
    os.makedirs(fixdir, exist_ok=True)
    import shutil

    shutil.copy(g1 + ".npz", os.path.join(fixdir, "golden.npz"))
    g2 = os.path.join(workdir, "golden_rerun")
    golden_cmd.callback(model=fixture, network=snap_out,
                        prompts_path="prompts/example_prompts.txt",
                        out=g2, fixtures=fixdir, tolerance=0.0)
    steps.append("golden")

    # 7. all: the one-command orchestration over the same synthetic artifacts
    #    (discovery by filename pattern, ordering, env wiring, self-FID smoke).
    allsrc = os.path.join(workdir, "allsrc")
    os.makedirs(allsrc, exist_ok=True)
    shutil.copy(inc_src, os.path.join(allsrc, "pt_inception-2015-12-05_synth.pt"))
    shutil.copy(clip_src, os.path.join(allsrc, "open_clip_vit_g14_synth.pt"))
    shutil.copy(dino_src, os.path.join(allsrc, "dino_deitsmall16_synth.pth"))
    shutil.copy(snap_src, os.path.join(allsrc, "network-snapshot-synth.pkl"))
    all_cmd.callback(src=allsrc, outdir=os.path.join(workdir, "weights_all"),
                     sd_path=fixture, inception_path=None, clip_path=None,
                     dino_path=None, snapshot_path=None, config_name="tiny",
                     skip_pytest=True, fid_smoke=True)
    steps.append("all")

    print(json.dumps({"drill": "pass", "steps": steps, "workdir": workdir}))


if __name__ == "__main__":
    cli()
