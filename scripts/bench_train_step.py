"""Measure the SiD distillation train step on the visible accelerator.

Parameterised over UNet width / microbatch / LoRA-psi / low-mem optimizer /
remat so the "largest configuration that fits one chip" (VERDICT round-2
item 2) is established by measurement, not guesswork.  Prints one JSON line
with ms/step, img/s/chip, estimated MFU (from XLA cost analysis), and the
post-step device memory stats.

Usage (serialize TPU runs — the axon claim is per-process):
  python scripts/bench_train_step.py --width 1.0 --mb 2 --lora --lowmem
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def zeros_params(module, *args):
    shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args))
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)["params"]


def device_mem_gb():
    stats = jax.local_devices()[0].memory_stats() or {}
    return {
        k: round(stats.get(k, 0) / 2**30, 3)
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
        if k in stats
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="sd15",
                    choices=["sd15", "sd21base", "tiny"],
                    help="base architecture preset (both production teachers)")
    ap.add_argument("--width", type=float, default=1.0, help="channel multiplier vs SD1.5")
    ap.add_argument("--mb", type=int, default=2, help="microbatch")
    ap.add_argument("--rounds", type=int, default=1, help="accumulation rounds")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--lora", action="store_true", help="LoRA-parameterised psi")
    ap.add_argument("--lowmem", action="store_true", help="bf16/no-mu Adam state")
    ap.add_argument("--remat", type=int, default=1)
    ap.add_argument("--remat-policy", default="full",
                    choices=["full", "dots", "dots_no_batch", "attn",
                             "attn_offload", "flash"])
    ap.add_argument("--kappa", type=float, default=1.5)
    ap.add_argument("--adv", type=float, default=0.0,
                    help="SiDA adversarial weight (D and G); 0 = plain SiD")
    ap.add_argument("--adv-tower", default="encoder",
                    choices=["encoder", "dino"],
                    help="discriminator tower: psi encoder (zero params) or "
                         "projected DINO on VAE-decoded pixels")
    ap.add_argument("--teacher-bf16", action="store_true",
                    help="store the frozen teacher in bf16 (compute already "
                         "casts params to bf16, so this only moves the one-time "
                         "rounding; frees ~1.7 GB at SD1.5 width)")
    ap.add_argument("--compile-only", action="store_true")
    ap.add_argument("--profile-dir", default=None,
                    help="capture a jax profiler trace of the timed steps here")
    ap.add_argument("--fsdp", type=int, default=1,
                    help="FSDP axis size (>1 = the sharded pod recipe: "
                         "params/opt/EMA sharded, batch over dp x fsdp; "
                         "--mb is then the GLOBAL microbatch)")
    ap.add_argument("--dp", type=int, default=None,
                    help="data-parallel axis size (default: devices / fsdp)")
    args = ap.parse_args()

    from sid_lsg_tpu import models
    from sid_lsg_tpu.diffusion import DDPMScheduler
    from sid_lsg_tpu.runtime.compile_cache import enable as enable_compile_cache
    from sid_lsg_tpu.training import (
        DistillConfig, init_state, jit_train_step, make_optimizer, make_train_step,
    )
    from sid_lsg_tpu.training.lora import apply_lora, init_lora

    enable_compile_cache()
    base = {"sd15": models.SD15, "sd21base": models.SD21_BASE,
            "tiny": models.TINY}[args.model]
    ucfg = models.scaled_unet_config(base.unet, args.width)
    unet = models.UNet2DCondition(ucfg, dtype=jnp.bfloat16, remat=bool(args.remat),
                                  remat_policy=args.remat_policy)
    apply = lambda p, x, t, c: unet.apply({"params": p}, x, t, c)

    L, D = 77, ucfg.cross_attention_dim
    lat = jnp.zeros((1, ucfg.sample_size, ucfg.sample_size, 4))
    params = zeros_params(unet, lat, jnp.zeros((1,), jnp.int32), jnp.zeros((1, L, D)))
    n_params = sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))

    fake_transform = None
    params_fake = None
    if args.lora:
        params_fake = init_lora(jax.random.PRNGKey(1), params, rank=4)
        fake_transform = lambda pf, teacher: apply_lora(teacher, pf)

    cfg = DistillConfig(
        latent_size=ucfg.sample_size,
        batch_size=args.mb * args.rounds,
        cfg_train_fake=args.kappa,
        cfg_eval_fake=args.kappa,
        cfg_eval_real=args.kappa,
        dtype=jnp.bfloat16,
        adv_weight_D=args.adv,
        adv_weight_G=args.adv,
        adv_tower=args.adv_tower,
    )
    opt_g = make_optimizer(lr=1e-6, low_mem_state=args.lowmem)
    opt_f = make_optimizer(lr=1e-6, low_mem_state=args.lowmem and not args.lora)
    unet_encode = (
        (lambda p, x, t, c: unet.apply({"params": p}, x, t, c, encoder_only=True))
        if args.adv > 0 and args.adv_tower == "encoder" else None
    )
    pixel_disc = None
    disc_frozen = None
    if args.adv > 0 and args.adv_tower == "dino":
        from sid_lsg_tpu.models.stylegan_discriminator import (
            DINO_VIT_S16, ProjectedDiscriminator,
        )
        from sid_lsg_tpu.training.adversarial import make_pixel_disc

        vae = models.AutoencoderKL(base.vae, dtype=jnp.bfloat16)
        res = ucfg.sample_size * 2 ** (len(base.vae.block_out_channels) - 1)
        vae_params = zeros_params(vae, jnp.zeros((1, res, res, 3)))
        disc = ProjectedDiscriminator(c_dim=D, vit=DINO_VIT_S16, power_iters=3)
        # REAL init for the (small) disc: zeros params make the spectral norm
        # 0/0 (sigma == 0) and poison the finite-metrics check.
        dvars = disc.init(
            jax.random.PRNGKey(2), jnp.zeros((1, 3, res, res), jnp.float32),
            jnp.zeros((1, D), jnp.float32))
        dparams = dict(dvars["params"])
        dino = dparams.pop("dino")
        pixel_disc, decode_params = make_pixel_disc(
            vae, disc, base.vae.scaling_factor)
        disc_frozen = {"vae": decode_params(vae_params), "dino": dino,
                       "spectral": dict(dvars["spectral"])}
        params_fake = {"psi": params_fake if params_fake is not None else params,
                       "disc": dparams}

    mesh = None
    if args.fsdp > 1 or (args.dp or 1) > 1:
        from sid_lsg_tpu.parallel import make_mesh

        mesh = make_mesh(fsdp=args.fsdp, dp=args.dp)

    step = make_train_step(apply, DDPMScheduler(), cfg, opt_g, opt_f,
                           fake_transform=fake_transform,
                           unet_encode=unet_encode,
                           mesh=mesh,
                           pixel_disc=pixel_disc)

    state = init_state(params, opt_g, opt_f, params_fake=params_fake)
    teacher = params
    if args.teacher_bf16:
        teacher = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
        # Free the f32 tree: keeping both copies alive costs a full param set
        # of HBM (3.4 GB at SD1.5 width) and defeats the point of the cast.
        for leaf in jax.tree_util.tree_leaves(params):
            leaf.delete()
        del params
    batch = {
        "emb_fake": jnp.zeros((args.rounds, args.mb, L, D)),
        "emb_g": jnp.zeros((args.rounds, args.mb, L, D)),
        "uncond_emb": jnp.zeros((L, D)),
    }
    if args.adv > 0:
        s = ucfg.sample_size
        batch["lat_real"] = jnp.zeros((args.rounds, args.mb, s, s, 4))
        batch["emb_real"] = jnp.zeros((args.rounds, args.mb, L, D))
    if disc_frozen is not None:
        batch["disc_frozen"] = disc_frozen
    rng = jax.random.PRNGKey(0)

    import contextlib

    scope = contextlib.nullcontext()
    if mesh is not None:
        # Production placement (Trainer wiring, training/loop.py:330-366):
        # FSDP rule over state/teacher, batch over dp x fsdp; Pallas kernels
        # trace inside shard_mesh_scope (shard_map manual regions).
        from sid_lsg_tpu.ops.attention import shard_mesh_scope
        from sid_lsg_tpu.parallel import shard_params, shard_round_batch

        place = lambda t: shard_params(t, mesh)
        arr = lambda x: place(x) if hasattr(x, "shape") and getattr(x, "ndim", 0) > 0 else x
        state = jax.tree_util.tree_map(arr, state)
        teacher = place(teacher)
        batch = shard_round_batch(batch, mesh)
        scope = shard_mesh_scope(mesh)
    jstep = jit_train_step(step, mesh=mesh, state=state, teacher=teacher,
                           batch=batch)

    t_c0 = time.perf_counter()
    with scope:
        lowered = jstep.lower(state, teacher, batch, rng)
        compiled = lowered.compile()
    compile_s = time.perf_counter() - t_c0
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0)) if cost else 0.0

    result = {
        "model": args.model,
        "width": args.width,
        "params_m": round(n_params / 1e6, 1),
        "mb": args.mb,
        "rounds": args.rounds,
        "lora": args.lora,
        "lowmem": args.lowmem,
        "remat": bool(args.remat),
        "remat_policy": args.remat_policy,
        "adv": args.adv,
        "adv_tower": args.adv_tower,
        "teacher_bf16": args.teacher_bf16,
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
        "mesh": dict(mesh.shape) if mesh is not None else None,
    }
    if args.compile_only:
        result["mem"] = device_mem_gb()
        print(json.dumps(result))
        return

    # Sync with a hard scalar READBACK of an UPDATED PARAMETER, not
    # block_until_ready: through the tunneled runtime, block_until_ready
    # intermittently resolves before the device work drains (one run measured
    # a fictional 46.7 ms full-width step = 5.9 'MFU'), and a loss scalar
    # resolves at the end of the forwards, leaving backward/update outside
    # the window.  A value fetch of a post-update param element cannot lie;
    # the ~1 ms per-step readback cost is accepted for honesty.
    def sync(st):
        leaf = jax.tree_util.tree_leaves(st.params_G)[0]
        return float(leaf.reshape(-1)[0])

    state, metrics = compiled(state, teacher, batch, rng)
    sync(state)  # warmup
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = compiled(state, teacher, batch, rng)
        sync(state)
    dt = (time.perf_counter() - t0) / args.iters
    if args.profile_dir:
        jax.profiler.stop_trace()

    peak_flops = 197e12  # v5e bf16
    n_chips = mesh.size if mesh is not None else 1
    result.update({
        "ms_per_step": round(dt * 1000, 1),
        # --mb is the GLOBAL microbatch under a mesh; normalise to per-chip.
        "img_per_sec_per_chip": round(args.mb * args.rounds / dt / n_chips, 3),
        # cost_analysis flops are per-device under SPMD; mfu stays per-chip.
        "mfu": round(flops / dt / peak_flops, 4) if flops else None,
        "step_tflop": round(flops / 1e12, 2) if flops else None,
        "mem": device_mem_gb(),
        "metrics_finite": bool(all(
            jnp.all(jnp.isfinite(jnp.asarray(v))) for v in metrics.values()
        )),
    })
    print(json.dumps(result))


if __name__ == "__main__":
    main()
