"""Measure generate_onestep's host-I/O overlap on the real chip (VERDICT r4 #4).

The 30k-image GigaGAN eval protocol (reference generate_onestep.py:277-310)
interleaves device generation with host PNG encoding; the reference loop is
fully serial (generate -> readback -> encode -> next batch), so encode time
adds directly to eval wall-clock.  Round 5 double-buffers the CLI loop
(cli/generate_onestep.py): batch N+1's jit is dispatched before batch N is
read back and encoded, hiding host work under device compute.

Three timed modes over the SAME jitted program (random-init sd15, bf16,
512px — the production inference path):

  nowrite  generate + hard readback only (compute+transfer floor)
  serial   readback -> PNG encode -> next dispatch (the reference structure)
  overlap  the production ``generate_images`` loop (double-buffered writes)

Done-bar from the verdict: overlap img/s within ~5% of nowrite.

Usage (TPU, warm cache; serialize against other TPU users):
  python scripts/bench_onestep_io.py --batch 8 --batches 16
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--model", default="sd15", help="preset (tiny for CPU smoke)")
    ap.add_argument("--outdir", default=None, help="default: fresh tmp dir")
    args = ap.parse_args()

    from sid_lsg_tpu.parallel import runtime

    runtime.init_distributed()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sid_lsg_tpu import native
    from sid_lsg_tpu.cli.generate_onestep import generate_images
    from sid_lsg_tpu.diffusion.rng import StackedRandomGenerator
    from sid_lsg_tpu.pipeline import SDPipeline

    pipe = SDPipeline.from_pretrained(args.model, dtype=jnp.bfloat16)
    size = pipe.config.unet.sample_size
    captions = [f"a photo of object {i}" for i in range(64)]
    n_img = args.batch * args.batches
    seeds = list(range(n_img))
    base = args.outdir or tempfile.mkdtemp(prefix="onestep_io_")

    def gen_batch(batch_seeds):
        lat = StackedRandomGenerator(batch_seeds).randn(
            (len(batch_seeds), size, size, 4)
        )
        prompts = [captions[i % len(captions)] for i in batch_seeds]
        return pipe.generate(prompts, lat, num_steps=1, init_timestep=625,
                             rng=jax.random.PRNGKey(0), as_numpy=False)

    # Warmup / compile (populates the persistent cache; also pins the prompt
    # encoder jit).
    np.asarray(gen_batch(seeds[: args.batch]))

    results = {}

    # --- nowrite: compute + device->host transfer only -----------------------
    t0 = time.perf_counter()
    for s in range(0, n_img, args.batch):
        np.asarray(gen_batch(seeds[s : s + args.batch]))
    results["nowrite"] = n_img / (time.perf_counter() - t0)

    # --- serial: the reference loop structure --------------------------------
    d = os.path.join(base, "serial")
    os.makedirs(d, exist_ok=True)
    t0 = time.perf_counter()
    for s in range(0, n_img, args.batch):
        bs = seeds[s : s + args.batch]
        imgs = np.asarray(gen_batch(bs))
        native.write_png_batch(
            [os.path.join(d, f"{i:06d}.png") for i in bs], imgs
        )
    results["serial"] = n_img / (time.perf_counter() - t0)

    # --- overlap: the production double-buffered CLI loop --------------------
    d = os.path.join(base, "overlap")
    t0 = time.perf_counter()
    written = generate_images(
        pipe, captions, seeds, d, max_batch_size=args.batch, progress=False
    )
    results["overlap"] = n_img / (time.perf_counter() - t0)
    assert written == n_img

    if args.outdir is None:
        shutil.rmtree(base, ignore_errors=True)

    print(json.dumps({
        "metric": "onestep_512px_io_overlap",
        "unit": "img/s",
        "batch": args.batch,
        "images": n_img,
        "nowrite_img_per_sec": round(results["nowrite"], 3),
        "serial_write_img_per_sec": round(results["serial"], 3),
        "overlap_write_img_per_sec": round(results["overlap"], 3),
        "overlap_vs_nowrite": round(results["overlap"] / results["nowrite"], 4),
        "serial_vs_nowrite": round(results["serial"] / results["nowrite"], 4),
    }, indent=None), flush=True)


if __name__ == "__main__":
    main()
