"""Golden regression pins: fixed-seed outputs stay stable across refactors.

The reference's quality control is visual regression on fixed-seed grids
(temporary_seed=2024, SURVEY.md §4).  Here the same idea is numeric: tiny
fixed-seed end-to-end outputs are pinned as statistics + probe pixels with
loose-but-meaningful tolerances (CPU f32; catches semantic changes like
scheduler coefficient or quantisation edits, not benign reorderings).

If an INTENTIONAL semantic change breaks these, regenerate the pins with
`python tests/test_golden.py` and include the update in the same commit.
"""

import json
import os

import jax
import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_values.json")


def _compute():
    from sid_lsg_tpu.diffusion.rng import seeded_latents
    from sid_lsg_tpu.pipeline import SDPipeline

    pipe = SDPipeline.random_init("tiny", seed=7)
    lat = seeded_latents([2024, 2025], pipe.config.unet.sample_size)
    imgs = pipe.generate(["golden prompt a", "golden prompt b"], lat,
                         num_steps=1, init_timestep=625)
    imgs = np.asarray(imgs, dtype=np.float64)
    probes = [imgs[0, 3, 5].tolist(), imgs[1, 10, 12].tolist()]
    # Scheduler coefficients are part of the pin (bit-level SD schedule).
    from sid_lsg_tpu.diffusion.ddpm import DDPMScheduler

    sched = DDPMScheduler()
    return {
        "image_mean": float(imgs.mean()),
        "image_std": float(imgs.std()),
        "probe_pixels": probes,
        "alphas_cumprod_t0": float(np.asarray(sched.alphas_cumprod)[0]),
        "alphas_cumprod_t625": float(np.asarray(sched.alphas_cumprod)[625]),
        "alphas_cumprod_t999": float(np.asarray(sched.alphas_cumprod)[999]),
    }


def test_golden_pipeline_outputs():
    if not os.path.exists(GOLDEN_PATH):
        import pytest

        pytest.skip("no golden file; run `python tests/test_golden.py` to create")
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    got = _compute()
    # Exact pins: schedule coefficients (pure math, platform independent).
    for key in ("alphas_cumprod_t0", "alphas_cumprod_t625", "alphas_cumprod_t999"):
        np.testing.assert_allclose(got[key], golden[key], rtol=1e-6, err_msg=key)
    # Image pins: uint8 outputs, allow small cross-version numeric drift.
    assert abs(got["image_mean"] - golden["image_mean"]) <= 1.0
    assert abs(got["image_std"] - golden["image_std"]) <= 1.5
    for got_px, ref_px in zip(got["probe_pixels"], golden["probe_pixels"]):
        np.testing.assert_allclose(got_px, ref_px, atol=3.0)


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    values = _compute()
    with open(GOLDEN_PATH, "w") as f:
        json.dump(values, f, indent=2)
    print(f"wrote {GOLDEN_PATH}: {values}")
