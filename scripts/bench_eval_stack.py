"""Compile + time the eval/metric stack ON THE TPU (VERDICT r4 #3).

Random-weight towers answer the two questions weights day must not hit
cold: (a) do the metric graphs COMPILE on the TPU at production shapes,
(b) what does a 30k-image eval COST.  Until round 5 these graphs had only
ever met the CPU backend in tests; the reference runs metrics inside the
training run (sid_training_loop.py:619-638, sid_metric_utils.py:237-506),
so their TPU cost is part of the training-loop budget.

Three JSON lines:
  1. inception_features — InceptionV3Features (in-graph 299 resize, the
     FID detector path) over uint8 512px batches.
  2. clip_image_features — the laion2b ViT-g-14 vision tower (the CLIP
     score detector): device feature time PLUS the host-side open_clip
     PIL preprocess (bicubic resize + center crop) measured separately —
     both are on the 30k critical path.
  3. fid_clip_loop — the fid_clip_test-shaped end-to-end loop: one-step
     generator (512px UNet + VAE decode) -> uint8 -> BOTH detectors ->
     FeatureStats moments, double-buffered like generate_onestep.

Usage (real TPU, serialize against other TPU users):
  python scripts/bench_eval_stack.py [--batch 32] [--iters 4] [--skip generator]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32,
                    help="detector batch (the metric loop's unit)")
    ap.add_argument("--gen-batch", type=int, default=8,
                    help="generator batch for the end-to-end loop")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--stages", default="inception,clip,loop",
                    help="comma list: inception,clip,loop")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny towers/shapes (CPU smoke of all three stages)")
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    from sid_lsg_tpu.parallel import runtime

    runtime.init_distributed()

    import jax
    import jax.numpy as jnp
    import numpy as np

    B, N_EVAL = args.batch, 30000
    res = 64 if args.tiny else 512
    rng = np.random.RandomState(0)
    imgs512 = rng.randint(0, 256, (B, res, res, 3), np.uint8)

    def timed(fn, *a):
        out = jax.block_until_ready(fn(*a))
        # hard readback bounds the step through the tunnel (BENCH_NOTES)
        float(np.asarray(out).reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
            float(np.asarray(out).reshape(-1)[0])
        return (time.perf_counter() - t0) / args.iters

    # ---- 1. Inception (FID detector) ----------------------------------------
    if "inception" in stages:
        from sid_lsg_tpu.models.inception import (
            InceptionV3Features, load_inception_params,
        )

        model = InceptionV3Features()
        params = load_inception_params(None)  # random: compile+throughput only
        feat = jax.jit(lambda p, x: model.apply({"params": p}, x))
        t0 = time.perf_counter()
        dt = timed(feat, params, jnp.asarray(imgs512))
        print(json.dumps({
            "metric": "inception_features_512px", "unit": "img/s",
            "batch": B, "img_per_sec": round(B / dt, 1),
            "ms_per_batch": round(dt * 1000, 2),
            "projected_30k_s": round(N_EVAL / (B / dt), 1),
            "compile_plus_first_s": round(time.perf_counter() - t0 - dt * args.iters, 1),
        }), flush=True)

    # ---- 2. CLIP ViT-g-14 (CLIP-score detector) ------------------------------
    if "clip" in stages:
        from sid_lsg_tpu.models.clip_vision import (
            TINY_CLIP, VIT_G_14, CLIPScorer, openclip_preprocess_uint8,
        )

        ccfg = TINY_CLIP if args.tiny else VIT_G_14
        scorer = CLIPScorer(ccfg, dtype=jnp.bfloat16)
        size = ccfg.vision.image_size
        # Host-side open_clip preprocess (PIL bicubic + crop): per-image cost.
        t0 = time.perf_counter()
        pixels01 = openclip_preprocess_uint8(imgs512, size)
        host_s_per_img = (time.perf_counter() - t0) / B
        px = jnp.asarray(pixels01)
        t0 = time.perf_counter()
        dt = timed(scorer._jimg, scorer.params, px)
        total_per_img = dt / B + host_s_per_img
        print(json.dumps({
            "metric": "clip_vitg14_image_features", "unit": "img/s",
            "batch": B, "device_img_per_sec": round(B / dt, 1),
            "host_preprocess_ms_per_img": round(host_s_per_img * 1000, 2),
            "combined_img_per_sec": round(1.0 / total_per_img, 1),
            "projected_30k_s_combined": round(N_EVAL * total_per_img, 1),
            "compile_plus_first_s": round(time.perf_counter() - t0 - dt * args.iters, 1),
        }), flush=True)

    # ---- 3. fid_clip_test-shaped end-to-end loop -----------------------------
    if "loop" in stages:
        from sid_lsg_tpu import models
        from sid_lsg_tpu.diffusion import DDPMScheduler
        from sid_lsg_tpu.metrics.feature_stats import FeatureStats
        from sid_lsg_tpu.models.inception import (
            InceptionV3Features, load_inception_params,
        )

        sd = models.TINY if args.tiny else models.SD15
        unet = models.UNet2DCondition(sd.unet, dtype=jnp.bfloat16)
        vae = models.AutoencoderKL(sd.vae, dtype=jnp.bfloat16)
        scheduler = DDPMScheduler()
        gb = args.gen_batch

        def zeros_params(module, *a):
            shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *a))
            return jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes)["params"]

        ls = sd.unet.sample_size
        lat = jnp.zeros((gb, ls, ls, 4), jnp.float32)
        ts = jnp.full((gb,), 625, jnp.int32)
        emb = jnp.zeros((gb, 77, sd.unet.cross_attention_dim), jnp.float32)
        up = zeros_params(unet, lat, ts, emb)
        vp = zeros_params(vae, jnp.zeros((1, sd.resolution, sd.resolution, 3)))
        inc = InceptionV3Features()
        ip = load_inception_params(None)

        @jax.jit
        def gen_and_features(up, vp, ip, lat, ts, emb):
            """generate -> decode -> uint8 -> FID features, ONE graph: the
            fused in-loop eval the reference runs serially through torch
            modules (sid_metric_utils.py:237-306)."""
            eps = unet.apply({"params": up}, lat, ts, emb)
            x0 = scheduler.pred_original_sample(eps.astype(jnp.float32), ts, lat)
            img = vae.apply({"params": vp}, x0 / sd.vae.scaling_factor,
                            method=vae.decode)
            u8 = jnp.clip((img.astype(jnp.float32) + 1) * 127.5, 0, 255
                          ).astype(jnp.uint8)
            return inc.apply({"params": ip}, u8)

        stats = FeatureStats(capture_mean_cov=True)
        dt = timed(gen_and_features, up, vp, ip, lat, ts, emb)
        stats.append(np.asarray(gen_and_features(up, vp, ip, lat, ts, emb)))
        assert stats.num_items == gb
        print(json.dumps({
            "metric": "fid_eval_loop_generate_plus_features", "unit": "img/s",
            "batch": gb, "img_per_sec": round(gb / dt, 2),
            "ms_per_batch": round(dt * 1000, 1),
            "projected_30k_min": round(N_EVAL / (gb / dt) / 60, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
