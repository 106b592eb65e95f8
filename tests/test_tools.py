"""Dataset prep tools, HPSv2 harness and misc-util tests."""

import json
import os
import subprocess
import sys
import zipfile

import numpy as np
import pytest


def _make_images(d, n=6, size=40):
    from PIL import Image

    rng = np.random.RandomState(0)
    os.makedirs(d, exist_ok=True)
    names = []
    for i in range(n):
        name = f"COCO_val2014_{i:012d}.jpg"
        Image.fromarray(rng.randint(0, 256, (size + i, size, 3), np.uint8)).save(
            os.path.join(d, name)
        )
        names.append(name)
    return names


def test_cocodataset_tool(tmp_path):
    from sid_lsg_tpu.cli.cocodataset_tool import convert_coco

    src = str(tmp_path / "val2014")
    names = _make_images(src)
    ann = {
        "images": [{"id": i, "file_name": n} for i, n in enumerate(names)],
        "annotations": [
            {"image_id": i, "caption": f"  caption {i} "} for i in range(len(names))
        ] + [{"image_id": 0, "caption": "duplicate ignored"}],
    }
    ann_path = str(tmp_path / "captions_val2014.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    dest = str(tmp_path / "coco256")
    cap_path = str(tmp_path / "captions.txt")
    n = convert_coco(src, ann_path, dest, resolution=32, max_images=4,
                     captions_out=cap_path)
    assert n == 4
    # Caption corpus export (the reference prompts/captions.txt role): line i
    # is the prompt for eval image/seed i.
    with open(cap_path) as f:
        assert f.read().splitlines() == [f"caption {i}" for i in range(4)]
    from sid_lsg_tpu.data import CocoCaptionDataset

    ds = CocoCaptionDataset(dest)
    assert len(ds) == 4
    img, cap = ds[0]
    assert img.shape == (32, 32, 3) and cap == "caption 0"
    # Power-of-two enforcement.
    import click

    with pytest.raises(click.UsageError):
        convert_coco(src, ann_path, str(tmp_path / "bad"), resolution=48)


def test_cocodataset_tool_zip_roundtrip(tmp_path):
    """Zip ingestion parity (reference training/dataset.py:168-203): the same
    corpus written as a folder and as a .zip must produce identical images,
    captions and batch streams through CocoCaptionDataset."""
    import pickle

    from sid_lsg_tpu.cli.cocodataset_tool import convert_coco
    from sid_lsg_tpu.data import CocoCaptionDataset

    src = str(tmp_path / "val2014")
    names = _make_images(src)
    ann = {
        "images": [{"id": i, "file_name": n} for i, n in enumerate(names)],
        "annotations": [
            {"image_id": i, "caption": f"caption {i}"} for i in range(len(names))
        ],
    }
    ann_path = str(tmp_path / "captions_val2014.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    folder = str(tmp_path / "coco")
    archive = str(tmp_path / "coco.zip")
    assert convert_coco(src, ann_path, folder, resolution=32, max_images=4) == 4
    assert convert_coco(src, ann_path, archive, resolution=32, max_images=4) == 4

    ds_dir = CocoCaptionDataset(folder)
    ds_zip = CocoCaptionDataset(archive)
    assert len(ds_dir) == len(ds_zip) == 4
    assert ds_zip.name == "coco"
    for i in range(4):
        img_d, cap_d = ds_dir[i]
        img_z, cap_z = ds_zip[i]
        np.testing.assert_array_equal(img_d, img_z)
        assert cap_d == cap_z == f"caption {i}"
    assert ds_dir.captions() == ds_zip.captions()
    # identical batch stream (the metric-stack entry point)
    for (bi_d, bc_d), (bi_z, bc_z) in zip(ds_dir.batches(3), ds_zip.batches(3)):
        np.testing.assert_array_equal(bi_d, bi_z)
        assert bc_d == bc_z
    # zip handles are not fork/pickle-safe; the backend must drop and reopen
    ds2 = pickle.loads(pickle.dumps(ds_zip))
    np.testing.assert_array_equal(ds2[1][0], ds_zip[1][0])


def test_dataset_tool_zip_feeds_metric_dataset(tmp_path):
    """A dataset_tool --dest out.zip archive (pngs + dataset.json, no captions)
    must load for FID real-stats: images readable, captions empty."""
    src = str(tmp_path / "imgs")
    _make_images(src, n=3)
    dest = str(tmp_path / "out.zip")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, "-m", "sid_lsg_tpu.cli.dataset_tool",
         "--source", src, "--dest", dest, "--resolution", "16"],
        capture_output=True, text=True, timeout=120,
        cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    from sid_lsg_tpu.data import CocoCaptionDataset

    ds = CocoCaptionDataset(dest)
    assert len(ds) == 3
    img, cap = ds[0]
    assert img.shape == (16, 16, 3) and cap == ""


def test_dataset_tool_folder_to_zip(tmp_path):
    src = str(tmp_path / "imgs")
    _make_images(src, n=3)
    dest = str(tmp_path / "out.zip")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, "-m", "sid_lsg_tpu.cli.dataset_tool",
         "--source", src, "--dest", dest, "--resolution", "16"],
        capture_output=True, text=True, timeout=120,
        cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    with zipfile.ZipFile(dest) as zf:
        names = zf.namelist()
        assert "dataset.json" in names
        assert sum(n.endswith(".png") for n in names) == 3


def test_hpsv2_offline_harness(tmp_path):
    prompts = {"photo": [f"photo prompt {i}" for i in range(4)],
               "anime": [f"anime prompt {i}" for i in range(4)]}
    pj = str(tmp_path / "bench.json")
    with open(pj, "w") as f:
        json.dump(prompts, f)
    outdir = str(tmp_path / "hps")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, "-m", "sid_lsg_tpu.cli.generate_hpsv2",
         "--outdir", outdir, "--seeds", "0-2", "--batch", "2",
         "--repo_id", "tiny", "--prompts_json", pj, "--use_bf16", "0"],
        capture_output=True, text=True, timeout=500,
        cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for style in prompts:
        files = os.listdir(os.path.join(outdir, style))
        assert sum(f.endswith(".jpg") for f in files) == 3
    scores = json.load(open(os.path.join(outdir, "hpsv2_scores.json")))
    assert set(scores) == {"photo", "anime"}


def test_misc_utils():
    import jax.numpy as jnp

    from sid_lsg_tpu.utils.misc import assert_shape, count_params, profiled_function

    assert_shape(jnp.zeros((2, 3, 4)), [2, None, 4])
    with pytest.raises(AssertionError):
        assert_shape(jnp.zeros((2, 3)), [2, 4])
    with pytest.raises(AssertionError):
        assert_shape(jnp.zeros((2, 3)), [2, 3, 1])
    assert count_params({"a": np.zeros((2, 3)), "b": {"c": np.zeros(5)}}) == 11

    @profiled_function
    def f(x):
        return x * 2

    assert float(f(jnp.float32(3.0))) == 6.0


def test_sid_metrics_cli(tmp_path):
    import numpy as np
    from PIL import Image

    coco = tmp_path / "coco"
    coco.mkdir()
    rng = np.random.RandomState(0)
    for i in range(8):
        Image.fromarray(rng.randint(0, 256, (32, 32, 3), np.uint8)).save(coco / f"i{i}.png")
        (coco / f"i{i}.txt").write_text(f"cap {i}")
    out = tmp_path / "res"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               SIDLSG_OPS_IMPL="ref")
    r = subprocess.run(
        [sys.executable, "-m", "sid_lsg_tpu.cli.sid_metrics",
         "--metrics", "fid_test", "--data", str(coco), "--repo_id", "tiny",
         "--outdir", str(out), "--num", "4", "--batch", "4",
         "--resolution", "32", "--use_bf16", "0"],
        capture_output=True, text=True, timeout=500, cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out / "metric-fid_test.jsonl").exists()
    assert (out / "fid_test.txt").exists()


def _run_dataset_tool(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, "-m", "sid_lsg_tpu.cli.dataset_tool"] + args,
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))), env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def test_dataset_tool_cifar10(tmp_path):
    """Synthetic CIFAR-10 python tarball -> png archive with labels
    (reference dataset_tool.py:141-170 input format)."""
    import io
    import pickle
    import tarfile

    rng = np.random.RandomState(0)
    tar_path = str(tmp_path / "cifar-10-python.tar.gz")
    with tarfile.open(tar_path, "w:gz") as tar:
        for b in range(1, 6):
            payload = pickle.dumps({
                "data": rng.randint(0, 256, (2, 3 * 32 * 32), np.uint8),
                "labels": [b % 10, (b + 3) % 10],
            })
            info = tarfile.TarInfo(f"cifar-10-batches-py/data_batch_{b}")
            info.size = len(payload)
            tar.addfile(info, io.BytesIO(payload))
    dest = str(tmp_path / "out")
    _run_dataset_tool(["--source", tar_path, "--dest", dest])
    with open(os.path.join(dest, "dataset.json")) as f:
        labels = dict(json.load(f)["labels"])
    assert len(labels) == 10 and labels["00000000.png"] == 1
    from PIL import Image

    assert Image.open(os.path.join(dest, "00000000.png")).size == (32, 32)


def test_dataset_tool_mnist(tmp_path):
    """Synthetic MNIST idx-ubyte gz pair -> 32x32 padded pngs with labels
    (reference dataset_tool.py:193-220 input format)."""
    import gzip

    rng = np.random.RandomState(1)
    n = 5
    imgs = rng.randint(0, 256, (n, 28, 28), np.uint8)
    lbls = np.arange(n, dtype=np.uint8)
    img_gz = str(tmp_path / "train-images-idx3-ubyte.gz")
    lbl_gz = str(tmp_path / "train-labels-idx1-ubyte.gz")
    with gzip.open(img_gz, "wb") as f:
        f.write(b"\x00" * 16 + imgs.tobytes())
    with gzip.open(lbl_gz, "wb") as f:
        f.write(b"\x00" * 8 + lbls.tobytes())
    dest = str(tmp_path / "out.zip")
    _run_dataset_tool(["--source", img_gz, "--dest", dest, "--max-images", "4"])
    with zipfile.ZipFile(dest) as zf:
        names = zf.namelist()
        assert sorted(n for n in names if n.endswith(".png")) == [
            f"{i:08d}.png" for i in range(4)
        ]
        meta = json.loads(zf.read("dataset.json"))
        assert dict(meta["labels"])["00000003.png"] == 3
        from PIL import Image
        import io as _io

        im = Image.open(_io.BytesIO(zf.read("00000000.png")))
        assert im.size == (32, 32)
        # zero padding ring survives the round trip
        assert np.asarray(im)[0].max() == 0


def test_dataset_tool_lmdb_needs_package(tmp_path):
    """LMDB dirs are detected; without the optional lmdb package the tool
    fails with a clear message instead of a stack trace."""
    src = str(tmp_path / "db")
    os.makedirs(src)
    open(os.path.join(src, "data.mdb"), "wb").close()
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, "-m", "sid_lsg_tpu.cli.dataset_tool",
         "--source", src, "--dest", str(tmp_path / "out")],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))), env=env,
    )
    try:
        import lmdb  # noqa: F401
        pytest.skip("lmdb installed; error path not reachable")
    except ImportError:
        pass
    assert r.returncode != 0 and "lmdb" in (r.stdout + r.stderr)


# ---------------------------------------------------------------------------
# Prompt/figure assets (SURVEY A21): the in-tree eval corpus and golden
# figures.  These are DATA artifacts (public COCO-2014 captions + the
# reference's published figure outputs; see prompts/README.md) whose
# byte-level contract the eval protocol depends on: seed i renders caption
# line i (reference generate_onestep.py:228-232).
# ---------------------------------------------------------------------------

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_caption_corpus_contract():
    from sid_lsg_tpu.data.prompts import read_prompt_file

    path = os.path.join(_REPO, "prompts", "captions.txt")
    prompts = read_prompt_file(path)
    assert len(prompts) == 30000  # seeds 0-29999 (evaluate_coco256.sh)
    # read_prompt_file drops empty lines; the corpus must not contain any,
    # or the seed<->line pairing silently shifts.
    with open(path, encoding="utf-8") as f:
        raw = f.read().splitlines()
    assert len(raw) == 30000 and all(ln.strip() for ln in raw)
    # spot-pin the mapping so a re-sorted/filtered corpus fails loudly
    assert prompts[0].startswith("This wire metal rack")
    assert prompts[1] == "A motorcycle parked in a parking space next to another motorcycle."


def test_figure_prompts_match_golden_images():
    from sid_lsg_tpu.data.prompts import read_prompt_file

    fig_dirs = {
        "fig1-captions.txt": ["example_images/figure1"],
        "fig6-captions.txt": ["example_images/figure6/sd1.5",
                              "example_images/figure6/sd2.1base"],
        "fig8-captions.txt": ["example_images/figure8"],
    }
    for captions, dirs in fig_dirs.items():
        n = len(read_prompt_file(os.path.join(_REPO, "prompts", captions)))
        assert n > 0
        for d in dirs:
            pngs = [f for f in os.listdir(os.path.join(_REPO, d))
                    if f.endswith(".png")]
            # goldens are seed-indexed 000000.png..; at least one per prompt
            # (figure1 ships one extra unprompted sample — allow >=)
            assert len(pngs) >= n, (d, len(pngs), n)
            assert sorted(pngs)[0] == "000000.png"


def test_prepare_weights_drill(tmp_path):
    """Weights-arrival readiness drill (VERDICT r3 #10): every
    `prepare_weights.py` subcommand end-to-end on synthetic artifact-shaped
    inputs — sd (fixture load + generation smoke), inception/clip/dino
    (synthetic torch checkpoints through convert/validate/save + the
    metrics/detectors consumer path), snapshot ({'ema': ...} pickle ->
    safetensors), golden (grid + fixture compare), and the one-command
    `all` orchestration (round 5: discovery, ordering, env wiring,
    self-FID smoke)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, "scripts/prepare_weights.py", "verify",
         "--workdir", str(tmp_path)],
        capture_output=True, text=True, timeout=1500,
        cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    verdict = json.loads(r.stdout.strip().splitlines()[-1])
    assert verdict["drill"] == "pass"
    assert verdict["steps"] == ["sd", "inception", "clip", "dino",
                                "snapshot", "golden", "all"]


def test_eval_stack_bench_smoke(tmp_path):
    """The TPU eval-stack bench (scripts/bench_eval_stack.py, VERDICT r4 #3)
    runs all three stages on the CPU backend with tiny towers, emitting one
    JSON line each — keeps the script from rotting between TPU sessions."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, "scripts/bench_eval_stack.py", "--tiny",
         "--batch", "2", "--gen-batch", "2", "--iters", "1"],
        capture_output=True, text=True, timeout=900,
        cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    lines = [json.loads(l) for l in r.stdout.strip().splitlines()
             if l.startswith("{")]
    assert {l["metric"] for l in lines} == {
        "inception_features_512px", "clip_vitg14_image_features",
        "fid_eval_loop_generate_plus_features"}
    assert all(np.isfinite(v) for l in lines for v in l.values()
               if isinstance(v, (int, float)))


def test_onestep_io_bench_smoke(tmp_path):
    """The I/O-overlap bench (scripts/bench_onestep_io.py, VERDICT r4 #4)
    runs all three modes (nowrite/serial/overlap) on the CPU backend with the
    tiny pipeline and emits one JSON line — keeps the script honest between
    TPU sessions."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, "scripts/bench_onestep_io.py", "--model", "tiny",
         "--batch", "2", "--batches", "2", "--outdir", str(tmp_path)],
        capture_output=True, text=True, timeout=900,
        cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    line = json.loads([l for l in r.stdout.strip().splitlines()
                       if l.startswith("{")][-1])
    assert line["metric"] == "onestep_512px_io_overlap"
    for k in ("nowrite_img_per_sec", "serial_write_img_per_sec",
              "overlap_write_img_per_sec"):
        assert np.isfinite(line[k]) and line[k] > 0
    # The overlap mode actually wrote the images.
    import pathlib
    pngs = list(pathlib.Path(tmp_path, "overlap").glob("*.png"))
    assert len(pngs) == line["images"] == 4


def test_bench_orchestration_order_and_skips():
    """bench.py budget orchestration: the headline stage gets budget PRIORITY
    (runs + prints first, so a driver-side kill mid-bench still records it)
    and its line is RE-printed last (the driver parses the final line); an
    exhausted budget yields explicit skip markers with the same contract."""
    headline = "sd15_fullwidth_distill_images_per_sec_per_chip"
    # (a) real subprocess path via the selftest hook: headline first, and
    # RE-asserted after every later line so "last complete line == headline"
    # holds at every instant a driver-side kill could land.
    env = dict(os.environ, SIDLSG_BENCH_SELFTEST="1", SIDLSG_BENCH_BUDGET_S="600")
    r = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                       text=True, timeout=300, cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    assert [l["metric"] for l in lines] == [
        headline,
        "onestep_512px_images_per_sec_per_chip",
        headline,
        "sd15_halfwidth_fullpsi_distill_images_per_sec_per_chip",
        headline,
    ]
    assert all(l.get("selftest") and l["value"] == 1.0 for l in lines)
    assert lines[0] == lines[-1]
    # (b) exhausted budget: explicit skip markers, headline still re-asserted
    # after each later marker and final overall.
    env["SIDLSG_BENCH_BUDGET_S"] = "1"
    r = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                       text=True, timeout=300, cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 5 and lines[-1]["metric"] == headline
    assert all(l["value"] is None and "skipped" in l for l in lines)


def test_bench_train_step_fsdp_recipe_smoke(tmp_path):
    """The pinned pod bench recipe (PODDAY.md: bench_train_step --fsdp/--dp)
    builds the dp x fsdp mesh, applies the production FSDP placement and
    shard_map kernel scoping, and reports per-chip throughput — smoked on a
    4-virtual-device CPU mesh with the tiny preset so the recipe cannot rot
    between pod sessions."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    r = subprocess.run(
        [sys.executable, "scripts/bench_train_step.py", "--model", "tiny",
         "--mb", "4", "--fsdp", "2", "--dp", "2", "--iters", "1",
         "--remat", "0"],
        capture_output=True, text=True, timeout=900,
        cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    line = json.loads([l for l in r.stdout.strip().splitlines()
                       if l.startswith("{")][-1])
    assert line["mesh"] == {"dp": 2, "fsdp": 2}
    assert np.isfinite(line["img_per_sec_per_chip"]) and line["img_per_sec_per_chip"] > 0
