"""End-to-end smoke of the training orchestration through the real CLI.

The reference's equivalent surface is ``sid_train.py`` driving
``training/sid_training_loop.py`` (ticks, stats jsonl, snapshots, resume —
sid_training_loop.py:262-661).  Everything below runs the ACTUAL console
entry in a subprocess on the forced-CPU backend with the tiny preset and
synthetic prompts, then asserts the run-dir artifact contract and the
resume='latest' path.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(outdir, *extra):
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
        # Single-device smoke: drop the suite's 8-virtual-device force (the
        # multi-device Trainer path is covered by test_distill /
        # dryrun_multichip; mb=2 is not divisible by an 8-way mesh).
        "XLA_FLAGS": " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if not f.startswith("--xla_force_host_platform_device_count")
        ),
    })
    cmd = [
        sys.executable, "-m", "sid_lsg_tpu.cli.sid_train",
        "--outdir", str(outdir), "--sd_model", "tiny",
        "--batch", "2", "--batch-micro", "2",
        "--tick", "0", "--snap", "1", "--bf16", "0",
        *extra,
    ]
    return subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                          text=True, timeout=900)


def test_sid_train_cli_ticks_snapshots_and_resume(tmp_path):
    out = tmp_path / "runs"
    r = _run_cli(out, "--max-ticks", "1")
    assert r.returncode == 0, r.stderr[-2000:]

    runs = sorted(os.listdir(out))
    assert len(runs) == 1
    rd = out / runs[0]
    # Artifact contract (reference writes the same set: training_options.json,
    # log.txt, stats jsonl, fakes grids, network snapshots).
    names = set(os.listdir(rd))
    assert "training_options.json" in names
    assert "log.txt" in names
    assert any(n.startswith("stats_") and n.endswith(".jsonl") for n in names)
    # Grid cadence/naming parity (sid_training_loop.py:597-614): grids for
    # num_steps_eval in [1,2,4] unconditionally, reference file pattern
    # fakes_{alpha:03f}_{kimg:06d}_{steps}.png (alpha defaults to 1).
    for steps in (1, 2, 4):
        assert f"fakes_1.000000_000000_{steps}.png" in names, sorted(names)
    snaps = [n for n in names if "network" in n or "snapshot" in n]
    assert snaps, f"no snapshot written at --snap 1: {sorted(names)}"

    opts = json.loads((rd / "training_options.json").read_text())
    assert opts["batch_size"] == 2

    stats_file = next(n for n in names if n.startswith("stats_"))
    lines = [json.loads(l) for l in (rd / stats_file).read_text().splitlines()]
    assert lines and all("fake_loss" in l or "Loss/fake" in str(l) for l in lines)

    # Resume 'latest': a second numbered run dir that starts from the snapshot.
    r2 = _run_cli(out, "--max-ticks", "1", "--resume", "latest")
    assert r2.returncode == 0, r2.stderr[-2000:]
    runs2 = sorted(os.listdir(out))
    assert len(runs2) == 2
    log2 = (out / runs2[1] / "log.txt").read_text()
    assert "resum" in log2.lower(), log2[-1500:]
