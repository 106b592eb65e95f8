"""Eval-stack tests: FID math, feature stats, metric plumbing, P&R, CLIP, Inception."""

import numpy as np
import pytest

from sid_lsg_tpu.metrics import (
    FeatureStats,
    MetricOptions,
    calc_metric,
    frechet_distance,
    is_valid_metric,
    list_valid_metrics,
)
from sid_lsg_tpu.metrics.fid import _sqrtm_newton_schulz, sqrtm_product_trace
from sid_lsg_tpu.metrics.precision_recall import compute_pr


def _rand_cov(rng, d):
    a = rng.randn(d, d)
    return a @ a.T / d + np.eye(d) * 0.1


def test_frechet_distance_analytic():
    rng = np.random.RandomState(0)
    mu = rng.randn(8)
    cov = _rand_cov(rng, 8)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6
    # Pure mean shift: FID = |d|^2.
    shift = rng.randn(8)
    fid = frechet_distance(mu, cov, mu + shift, cov)
    assert np.isclose(fid, np.sum(shift**2), rtol=1e-5)
    # Isotropic scale: closed form for cov aI vs bI: d(a,b) = D(sqrt(a)-sqrt(b))^2.
    eye = np.eye(8)
    fid = frechet_distance(mu, 4.0 * eye, mu, 1.0 * eye)
    assert np.isclose(fid, 8 * (2.0 - 1.0) ** 2, rtol=1e-5)


def test_sqrtm_newton_schulz_matches_scipy():
    rng = np.random.RandomState(1)
    a, b = _rand_cov(rng, 16), _rand_cov(rng, 16)
    t_scipy = sqrtm_product_trace(a, b)
    ra = _sqrtm_newton_schulz(a)
    sym = ra @ b @ ra
    t_ns = float(np.trace(_sqrtm_newton_schulz(0.5 * (sym + sym.T))))
    assert np.isclose(t_scipy, t_ns, rtol=1e-4)


def test_feature_stats_streaming():
    rng = np.random.RandomState(2)
    x = rng.randn(100, 5).astype(np.float32)
    st = FeatureStats(capture_all=True, capture_mean_cov=True)
    for i in range(0, 100, 7):
        st.append(x[i : i + 7])
    mean, cov = st.get_mean_cov()
    np.testing.assert_allclose(mean, x.mean(0), atol=1e-5)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), atol=1e-4)
    np.testing.assert_array_equal(st.get_all(), x)
    # max_items truncation.
    st2 = FeatureStats(capture_mean_cov=True, max_items=10)
    st2.append(x)
    assert st2.num_items == 10 and st2.is_full()


def test_precision_recall_identical_and_disjoint():
    rng = np.random.RandomState(3)
    a = rng.randn(64, 8).astype(np.float32)
    p, r = compute_pr(a, a.copy())
    assert p == 1.0 and r == 1.0
    far = a + 1000.0
    p, r = compute_pr(a, far)
    assert p == 0.0 and r == 0.0


@pytest.fixture(scope="module")
def fake_coco_dir(tmp_path_factory):
    from PIL import Image

    rng = np.random.RandomState(0)
    d = tmp_path_factory.mktemp("coco")
    for i in range(24):
        img = rng.randint(0, 256, (32, 32, 3), np.uint8)
        Image.fromarray(img).save(d / f"img{i:03d}.png")
        (d / f"img{i:03d}.txt").write_text(f"caption {i}")
    return str(d)


def _cheap_detector(images):
    """Deterministic stand-in detector: fixed random projection of pixels."""
    x = images.astype(np.float32).reshape(len(images), -1) / 255.0
    proj = np.random.RandomState(42).randn(x.shape[1], 16).astype(np.float32)
    return x @ proj


def test_registry_and_fid_test_metric(fake_coco_dir, tmp_path):
    from sid_lsg_tpu.pipeline import SDPipeline

    assert is_valid_metric("fid30k_full") and is_valid_metric("fid_clip_30k_full")
    assert is_valid_metric("fid_test") and is_valid_metric("pr_test")
    assert len(list_valid_metrics()) >= 6
    pipe = SDPipeline.random_init("tiny")
    opts = MetricOptions(
        pipe=pipe, dataset_path=fake_coco_dir, detector=_cheap_detector,
        cache_dir=str(tmp_path / "cache"), batch_size=4, num_gen=8,
        resolution=32, verbose=False,
    )
    res = calc_metric("fid_test", opts=opts)
    assert np.isfinite(res.results.fid_test)
    # Real-stats cache hit second time.
    res2 = calc_metric("fid_test", opts=opts)
    assert np.isclose(res.results.fid_test, res2.results.fid_test)
    pr = calc_metric("pr_test", opts=opts)
    assert 0.0 <= pr.results.pr_test_precision <= 1.0


def test_fid_clip_test_metric(fake_coco_dir, tmp_path):
    from sid_lsg_tpu.models.clip_vision import TINY_CLIP, CLIPScorer
    from sid_lsg_tpu.pipeline import SDPipeline

    pipe = SDPipeline.random_init("tiny")
    opts = MetricOptions(
        pipe=pipe, dataset_path=fake_coco_dir, detector=_cheap_detector,
        clip=CLIPScorer(TINY_CLIP), cache_dir=str(tmp_path / "cache2"),
        batch_size=4, num_gen=4, resolution=32, verbose=False,
    )
    res = calc_metric("fid_clip_test", opts=opts)
    assert np.isfinite(res.results.fid_clip_test)
    assert -1.0 <= res.results.clip_score_test <= 1.0


def test_clip_scorer_tiny():
    from sid_lsg_tpu.models.clip_vision import TINY_CLIP, CLIPScorer

    scorer = CLIPScorer(TINY_CLIP)
    imgs = np.random.RandomState(0).randint(0, 256, (2, 32, 32, 3), np.uint8)
    s = np.asarray(scorer.score(imgs, ["a cat", "a dog"]))
    assert s.shape == (2,)
    assert np.all(np.abs(s) <= 1.0 + 1e-5)
    s2 = np.asarray(scorer.score(imgs, ["a cat", "a dog"]))
    np.testing.assert_allclose(s, s2)


def test_inception_features_shape():
    import jax.numpy as jnp

    from sid_lsg_tpu.models.inception import (
        FEATURE_DIM,
        InceptionV3Features,
        load_inception_params,
    )

    params = load_inception_params()
    model = InceptionV3Features()
    imgs = np.random.RandomState(0).randint(0, 256, (2, 64, 64, 3), np.uint8)
    feats = model.apply({"params": params}, jnp.asarray(imgs))
    assert feats.shape == (2, FEATURE_DIM)
    assert np.all(np.isfinite(np.asarray(feats)))


def test_convert_inception_folding():
    """BN folding: synthetic torch state dict == manual conv+bn composition."""
    from sid_lsg_tpu.models.inception import convert_inception

    rng = np.random.RandomState(0)
    sd = {
        "Conv2d_1a_3x3.conv.weight": rng.randn(32, 3, 3, 3).astype(np.float32),
        "Conv2d_1a_3x3.bn.weight": rng.rand(32).astype(np.float32) + 0.5,
        "Conv2d_1a_3x3.bn.bias": rng.randn(32).astype(np.float32),
        "Conv2d_1a_3x3.bn.running_mean": rng.randn(32).astype(np.float32),
        "Conv2d_1a_3x3.bn.running_var": rng.rand(32).astype(np.float32) + 0.5,
    }
    tree = convert_inception(sd)
    k = tree["Conv2d_1a_3x3"]["conv"]["kernel"]
    b = tree["Conv2d_1a_3x3"]["conv"]["bias"]
    assert k.shape == (3, 3, 3, 32) and b.shape == (32,)
    scale = sd["Conv2d_1a_3x3.bn.weight"] / np.sqrt(
        sd["Conv2d_1a_3x3.bn.running_var"] + 1e-3
    )
    np.testing.assert_allclose(
        b, sd["Conv2d_1a_3x3.bn.bias"] - sd["Conv2d_1a_3x3.bn.running_mean"] * scale,
        rtol=1e-5,
    )


def test_hpsv2_metric_offline():
    from sid_lsg_tpu.models.clip_vision import TINY_CLIP, CLIPScorer
    from sid_lsg_tpu.pipeline import SDPipeline

    pipe = SDPipeline.random_init("tiny")
    opts = MetricOptions(pipe=pipe, clip=CLIPScorer(TINY_CLIP), batch_size=2,
                         num_gen=4, verbose=False)
    opts.hpsv2_prompts = {"photo": ["a", "b"], "anime": ["c", "d"]}
    res = calc_metric("hpsv2", opts=opts)
    assert -1 <= res.results.hpsv2_mean <= 1
    assert set(res.results) == {"hpsv2_photo", "hpsv2_anime", "hpsv2_mean"}
