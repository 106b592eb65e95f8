"""AOT-compile the multi-chip distillation step against a TPU pod topology.

Proof-without-the-pod for the FSDP configuration (the reference's announced
roadmap item, README.md:11): JAX topology descriptions let the TPU compiler
target e.g. a v5e 2x2 slice from a single-chip (or chipless) host, so the
full-psi (non-LoRA) sharded train step can be validated — compiles, SPMD
partitions, and fits per-chip HBM — before any pod time is booked.

Prints one JSON line: topology, mesh, per-device memory analysis from the
compiled executable, and fit-vs-HBM verdict.

Usage:
  python scripts/aot_compile_multichip.py --topology v5e:2x2 --fsdp 4 \
      --width 1.0 --mb 2
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Topology compile needs only libtpu's compiler, not a device claim.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-8")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ.setdefault("TPU_SKIP_MDS_QUERY", "1")
# The host backend is CPU but the lowering target is TPU: force the Pallas
# kernels (registry 'auto' would see the cpu backend and pick 'ref', whose
# S x S attention does not fit TPU HBM at training shapes).
os.environ.setdefault("SIDLSG_OPS_IMPL", "pallas")

import jax
import jax.numpy as jnp
import numpy as np

V5E_HBM_BYTES = 16 * 2**30  # v5e: 16 GiB per chip


def abstract_params(module, *args):
    return jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args))["params"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x2",
                    help="PJRT topology name (v5e:2x2, v5e:2x4, v5e:4x4, ...)")
    ap.add_argument("--fsdp", type=int, default=4)
    ap.add_argument("--dp", type=int, default=None)
    ap.add_argument("--width", type=float, default=1.0)
    ap.add_argument("--mb", type=int, default=2, help="PER-DEVICE microbatch")
    ap.add_argument("--kappa", type=float, default=1.5)
    ap.add_argument("--lora", action="store_true",
                    help="LoRA psi (default: FULL psi — the fsdp proof target)")
    ap.add_argument("--remat-policy", default="full",
                    choices=["full", "dots", "dots_no_batch", "attn",
                             "attn_offload", "flash"])
    ap.add_argument("--lowmem", action="store_true")
    ap.add_argument("--teacher-bf16", action="store_true")
    ap.add_argument("--eval", action="store_true",
                    help="compile the EVAL path (sid_sampler + VAE decode on "
                         "fsdp-sharded EMA params) instead of the train step")
    ap.add_argument("--adv", type=float, default=0.0,
                    help="SiDA adversarial weight (D and G); 0 = plain SiD")
    ap.add_argument("--adv-tower", default="encoder",
                    choices=["encoder", "dino"])
    args = ap.parse_args()

    from jax.experimental import topologies

    from sid_lsg_tpu import models
    from sid_lsg_tpu.diffusion import DDPMScheduler
    from sid_lsg_tpu.parallel.mesh import (
        batch_sharding, make_mesh, param_shardings, replicated_sharding,
    )
    from sid_lsg_tpu.training import (
        DistillConfig, init_state, make_optimizer, make_train_step,
    )

    topo = topologies.get_topology_desc(platform="tpu", topology_name=args.topology)
    devices = topo.devices
    mesh = make_mesh(fsdp=args.fsdp, dp=args.dp, devices=devices)
    from sid_lsg_tpu.ops.attention import set_shard_mesh

    set_shard_mesh(mesh)

    ucfg = models.scaled_unet_config(models.SD15.unet, args.width)
    unet = models.UNet2DCondition(ucfg, dtype=jnp.bfloat16, remat=True,
                                  remat_policy=args.remat_policy)
    apply = lambda p, x, t, c: unet.apply({"params": p}, x, t, c)

    L, D = 77, ucfg.cross_attention_dim
    lat = jnp.zeros((1, ucfg.sample_size, ucfg.sample_size, 4))
    params_abs = abstract_params(
        unet, lat, jnp.zeros((1,), jnp.int32), jnp.zeros((1, L, D))
    )

    if args.eval:
        compile_eval(args, mesh, unet, ucfg, params_abs, L, D)
        return

    fake_transform = None
    fake_abs = None
    if args.lora:
        from sid_lsg_tpu.training.lora import apply_lora, init_lora

        fake_abs = jax.eval_shape(
            lambda p: init_lora(jax.random.PRNGKey(1), p, rank=4), params_abs
        )
        fake_transform = lambda pf, teacher: apply_lora(teacher, pf)

    n_dev = len(devices)
    global_mb = args.mb * n_dev
    cfg = DistillConfig(
        latent_size=ucfg.sample_size, batch_size=global_mb,
        cfg_train_fake=args.kappa, cfg_eval_fake=args.kappa,
        cfg_eval_real=args.kappa, dtype=jnp.bfloat16,
        adv_weight_D=args.adv, adv_weight_G=args.adv,
        adv_tower=args.adv_tower,
    )
    opt_g = make_optimizer(lr=1e-6, low_mem_state=args.lowmem)
    opt_f = make_optimizer(lr=1e-6, low_mem_state=args.lowmem and not args.lora)
    unet_encode = (
        (lambda p, x, t, c: unet.apply({"params": p}, x, t, c, encoder_only=True))
        if args.adv > 0 and args.adv_tower == "encoder" else None
    )
    pixel_disc = None
    disc_frozen_abs = None
    if args.adv > 0 and args.adv_tower == "dino":
        from sid_lsg_tpu.models.stylegan_discriminator import (
            DINO_VIT_S16, ProjectedDiscriminator,
        )
        from sid_lsg_tpu.training.adversarial import make_pixel_disc

        vcfg = models_vae_config()
        vae = models.AutoencoderKL(vcfg, dtype=jnp.bfloat16)
        res = ucfg.sample_size * vcfg.vae_scale_factor
        vae_abs = jax.eval_shape(
            lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)))
        )["params"]
        disc = ProjectedDiscriminator(c_dim=D, vit=DINO_VIT_S16, power_iters=3)
        dvars_abs = jax.eval_shape(lambda: disc.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 3, res, res), jnp.float32),
            jnp.zeros((1, D), jnp.float32)))
        dparams_abs = dict(dvars_abs["params"])
        dino_abs = dparams_abs.pop("dino")
        pixel_disc, decode_params = make_pixel_disc(
            vae, disc, vcfg.scaling_factor)
        disc_frozen_abs = {"vae": decode_params(vae_abs), "dino": dino_abs,
                           "spectral": dict(dvars_abs["spectral"])}
        fake_abs = {"psi": fake_abs if fake_abs is not None else params_abs,
                    "disc": dparams_abs}
    # mesh= wires the phase-boundary with_sharding_constraints — the same
    # graph the Trainer jits (zero involuntary SPMD remats, VERDICT r2 #1).
    step = make_train_step(apply, DDPMScheduler(), cfg, opt_g, opt_f,
                           fake_transform=fake_transform, mesh=mesh,
                           unet_encode=unet_encode, pixel_disc=pixel_disc)

    state_abs = jax.eval_shape(
        lambda p, pf: init_state(p, opt_g, opt_f, params_fake=pf),
        params_abs, fake_abs,
    )
    teacher_abs = params_abs
    if args.teacher_bf16:
        teacher_abs = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16), params_abs
        )
    batch_abs = {
        "emb_fake": jax.ShapeDtypeStruct((1, global_mb, L, D), jnp.float32),
        "emb_g": jax.ShapeDtypeStruct((1, global_mb, L, D), jnp.float32),
        "uncond_emb": jax.ShapeDtypeStruct((L, D), jnp.float32),
    }
    if args.adv > 0:
        s = ucfg.sample_size
        batch_abs["lat_real"] = jax.ShapeDtypeStruct(
            (1, global_mb, s, s, 4), jnp.float32)
        batch_abs["emb_real"] = jax.ShapeDtypeStruct(
            (1, global_mb, L, D), jnp.float32)
    if disc_frozen_abs is not None:
        batch_abs["disc_frozen"] = disc_frozen_abs
    rng_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)

    # Shardings assembled by the same jit_train_step the Trainer uses.
    from sid_lsg_tpu.training import jit_train_step

    jstep = jit_train_step(step, mesh=mesh, state=state_abs,
                           teacher=teacher_abs, batch=batch_abs)
    t0 = time.perf_counter()
    lowered = jstep.lower(state_abs, teacher_abs, batch_abs, rng_abs)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0

    report(args, mesh, n_dev, compiled, compile_s, mode="train", extra={
        "global_mb": global_mb,
        "full_psi": not args.lora,
        "lowmem": args.lowmem,
        "teacher_bf16": args.teacher_bf16,
        "remat_policy": args.remat_policy,
        "adv": args.adv,
        "adv_tower": args.adv_tower,
    })


def compile_eval(args, mesh, unet, ucfg, params_abs, L, D):
    """AOT-compile the eval/sampling graph against the pod topology: one-step
    sid_sampler on the fsdp-SHARDED EMA params + full VAE decode to uint8
    (VERDICT r2 next-round #2; reference in-loop grids/metrics at
    sid_training_loop.py:597-638).  EMA params keep their training (fsdp)
    layout — no all-gathered eval copy is materialised in HBM."""
    from sid_lsg_tpu.diffusion import DDPMScheduler
    from sid_lsg_tpu.diffusion.sampling import sid_sampler
    from sid_lsg_tpu.parallel.mesh import batch_sharding, param_shardings

    vcfg = models_vae_config()
    from sid_lsg_tpu import models

    vae = models.AutoencoderKL(vcfg, dtype=jnp.bfloat16)
    res = ucfg.sample_size * vcfg.vae_scale_factor
    vae_abs = jax.eval_shape(
        lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)))
    )["params"]
    scheduler = DDPMScheduler()

    n_dev = len(mesh.devices.flat)
    global_mb = args.mb * n_dev

    def eval_fn(ema, vae_p, z, emb):
        apply = lambda x, t, c: unet.apply({"params": ema}, x, t, c)
        init_t = jnp.full((z.shape[0],), 625, jnp.int32)
        x0 = sid_sampler(apply, z, emb, init_t, scheduler, num_steps=1,
                         dtype=jnp.bfloat16)
        img = vae.apply({"params": vae_p}, x0 / vcfg.scaling_factor,
                        method=vae.decode)
        return jnp.clip(img.astype(jnp.float32) * 127.5 + 128.0, 0, 255).astype(jnp.uint8)

    p_sh = lambda t: param_shardings(t, mesh)
    b_sh = batch_sharding(mesh)
    z_abs = jax.ShapeDtypeStruct((global_mb, ucfg.sample_size, ucfg.sample_size, 4),
                                 jnp.float32)
    emb_abs = jax.ShapeDtypeStruct((global_mb, L, D), jnp.float32)
    jeval = jax.jit(eval_fn, in_shardings=(p_sh(params_abs), p_sh(vae_abs),
                                           b_sh, b_sh))
    t0 = time.perf_counter()
    compiled = jeval.lower(params_abs, vae_abs, z_abs, emb_abs).compile()
    compile_s = time.perf_counter() - t0
    report(args, mesh, n_dev, compiled, compile_s, mode="eval", extra={
        "global_mb": global_mb, "image_res": res,
    })


def models_vae_config():
    from sid_lsg_tpu import models

    return models.SD15.vae


def report(args, mesh, n_dev, compiled, compile_s, mode, extra):
    ma = compiled.memory_analysis()
    get = lambda k: int(getattr(ma, k, 0) or 0)
    per_dev = {
        "argument_gb": round(get("argument_size_in_bytes") / 2**30, 2),
        "output_gb": round(get("output_size_in_bytes") / 2**30, 2),
        "temp_gb": round(get("temp_size_in_bytes") / 2**30, 2),
        "alias_gb": round(get("alias_size_in_bytes") / 2**30, 2),
    }
    # Donation aliases the state into the output; live = args + temps.
    live_gb = per_dev["argument_gb"] + per_dev["temp_gb"]
    print(json.dumps({
        "mode": mode,
        "topology": args.topology,
        "devices": n_dev,
        "mesh": {k: int(v) for k, v in mesh.shape.items()},
        "width": args.width,
        "mb_per_device": args.mb,
        **extra,
        "compile_s": round(compile_s, 1),
        "per_device": per_dev,
        "live_gb": round(live_gb, 2),
        "hbm_gb": round(V5E_HBM_BYTES / 2**30, 2),
        "fits": live_gb < V5E_HBM_BYTES / 2**30,
    }))


if __name__ == "__main__":
    main()
