"""Real-weights gates — run automatically when local weights are present.

The container has zero egress, so these skip cleanly by default; pointing the
env vars below at local files turns them into the turnkey "weights arrived"
validation (VERDICT round-2 item 5):

  SIDLSG_SD15_DIR           HF-layout SD1.5 checkpoint dir
  SIDLSG_SNAPSHOT_PKL       reference network-snapshot-*.pkl
  SIDLSG_INCEPTION_WEIGHTS  TorchScript/state-dict InceptionV3
  SIDLSG_CLIP_WEIGHTS       open_clip ViT-g-14 checkpoint
  SIDLSG_GOLDEN_FIXTURES    dir with golden.npz pinned from a good run

The golden contract mirrors the reference's fixed-seed example_images
reproduction (README.md:139-157): image i is a pure function of
(weights, seed i, caption i, t_init=625).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _need(var):
    val = os.environ.get(var)
    if not val or not os.path.exists(val):
        pytest.skip(f"{var} not set / not present (offline)")
    return val


def _kit(args, timeout=1800):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "scripts/prepare_weights.py"] + args,
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return r.stdout


def test_sd15_checkpoint_loads_and_generates():
    sd_dir = _need("SIDLSG_SD15_DIR")
    out = _kit(["sd", "--src", sd_dir, "--smoke"])
    assert "smoke ok" in out


def test_reference_snapshot_converts(tmp_path):
    pkl = _need("SIDLSG_SNAPSHOT_PKL")
    out = str(tmp_path / "gen.safetensors")
    _kit(["snapshot", "--src", pkl, "--out", out])
    assert os.path.exists(out)


def test_inception_weights_convert(tmp_path):
    src = _need("SIDLSG_INCEPTION_WEIGHTS")
    _kit(["inception", "--src", src, "--out", str(tmp_path / "inc.pt")])


def test_clip_weights_convert(tmp_path):
    src = _need("SIDLSG_CLIP_WEIGHTS")
    _kit(["clip", "--src", src, "--out", str(tmp_path / "clip.pt")])


def test_golden_grid_reproduction(tmp_path):
    """End-to-end: teacher + distilled generator -> fixed-seed grid, compared
    against pinned fixtures when available."""
    sd_dir = _need("SIDLSG_SD15_DIR")
    args = ["golden", "--model", sd_dir, "--out", str(tmp_path / "golden")]
    pkl = os.environ.get("SIDLSG_SNAPSHOT_PKL")
    if pkl and os.path.exists(pkl):
        args += ["--network", pkl]
    fixtures = os.environ.get("SIDLSG_GOLDEN_FIXTURES")
    if fixtures and os.path.exists(fixtures):
        args += ["--fixtures", fixtures]
    _kit(args, timeout=3600)
    arr = np.load(str(tmp_path / "golden") + ".npz")["arr_0"]
    assert arr.dtype == np.uint8 and arr.shape[0] == 8


def test_golden_harness_runs_offline(tmp_path):
    """The harness itself is exercised in CI with the tiny preset + pinned
    fixtures produced in-run, so the real-weights path can't rot offline."""
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    _kit(["golden", "--model", "tiny", "--out", out1], timeout=900)
    fixtures = str(tmp_path / "fix")
    os.makedirs(fixtures)
    os.replace(out1 + ".npz", os.path.join(fixtures, "golden.npz"))
    out = _kit(["golden", "--model", "tiny", "--out", out2,
                "--fixtures", fixtures], timeout=900)
    assert '"pass": true' in out
