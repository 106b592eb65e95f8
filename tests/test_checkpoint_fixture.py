"""Committed tiny-HF-checkpoint golden: locks the converter import path.

VERDICT r2 #6 (second half): ``tests/fixtures/tiny_hf_ckpt`` is a COMMITTED
HF-layout checkpoint (diffusers/transformers key naming, safetensors) with
pinned generation outputs (``golden.npz``).  Loading it through
``load_sd_checkpoint`` and generating must reproduce the goldens — any
layout/transpose mutation in ``models/convert.py`` (or module-semantics
drift in the UNet/VAE/text towers) changes the result and fails here.
Block-level math parity is separately gated torch-side in
``test_torch_parity_sd_blocks.py``.
"""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_hf_ckpt")


@pytest.fixture(scope="module")
def fixture_pipe():
    if not os.path.isdir(FIXTURE):
        pytest.skip("fixture not built (tests/fixtures/make_tiny_ckpt.py)")
    from sid_lsg_tpu.models.configs import TINY
    from sid_lsg_tpu.models.convert import load_sd_checkpoint
    from sid_lsg_tpu.models.tokenizer import HashTokenizer
    from sid_lsg_tpu.pipeline import SDPipeline

    unet_p, vae_p, text_p = load_sd_checkpoint(FIXTURE, TINY)
    return SDPipeline(TINY, {"unet": unet_p, "vae": vae_p, "text": text_p},
                      HashTokenizer(vocab_size=TINY.text.vocab_size))


def test_fixture_golden_generation(fixture_pipe):
    import jax.numpy as jnp

    golden = np.load(os.path.join(FIXTURE, "golden.npz"))
    prompts = [str(p) for p in golden["prompts"]]
    emb = fixture_pipe.encode_prompts(prompts)
    # Text tower + tokenizer determinism through the converted checkpoint.
    np.testing.assert_allclose(np.asarray(emb), golden["emb"], atol=2e-4, rtol=1e-3)
    x0 = fixture_pipe.generate_latents(jnp.asarray(golden["latents"]),
                                       jnp.asarray(golden["emb"]))
    np.testing.assert_allclose(np.asarray(x0), golden["x0"], atol=5e-4, rtol=1e-3)
    imgs = fixture_pipe.decode(jnp.asarray(golden["x0"]))
    diff = np.abs(np.asarray(imgs).astype(np.int32) - golden["images"].astype(np.int32))
    assert diff.max() <= 1, f"decoded images drifted (max uint8 delta {diff.max()})"


def test_fixture_detects_transpose_mutation(fixture_pipe):
    """A deliberate layout mutation (conv kernel transposed the wrong way)
    must NOT reproduce the golden — proves the golden has teeth."""
    import jax.numpy as jnp

    golden = np.load(os.path.join(FIXTURE, "golden.npz"))
    params = fixture_pipe.params["unet"]
    k = np.asarray(params["conv_in"]["kernel"])  # HWIO
    mutated = dict(params)
    mutated["conv_in"] = dict(params["conv_in"], kernel=jnp.asarray(
        np.transpose(k, (1, 0, 2, 3))))  # swap H/W -> simulates a bad mapper
    x0 = fixture_pipe.generate_latents(
        jnp.asarray(golden["latents"]), jnp.asarray(golden["emb"]), params=mutated)
    assert not np.allclose(np.asarray(x0), golden["x0"], atol=5e-4, rtol=1e-3)


def test_from_pretrained_builds_config_from_checkpoint_jsons(fixture_pipe):
    """``SDPipeline.from_pretrained`` on a checkpoint DIRECTORY must build the
    architecture from the checkpoint's own config jsons (the reference loads
    architectures from hub configs, sid_sd_util.py:58-79) — not from a preset
    guess.  The fixture carries HF-layout config.json files; the loaded
    pipeline must match TINY field-for-field and reproduce the golden."""
    import jax.numpy as jnp

    from sid_lsg_tpu.models.configs import TINY, config_from_hf_json
    from sid_lsg_tpu.pipeline import SDPipeline

    cfg = config_from_hf_json(FIXTURE)
    assert (cfg.unet, cfg.vae, cfg.text) == (TINY.unet, TINY.vae, TINY.text)
    assert cfg.prediction_type == TINY.prediction_type
    assert cfg.resolution == TINY.resolution

    pipe = SDPipeline.from_pretrained(FIXTURE)
    golden = np.load(os.path.join(FIXTURE, "golden.npz"))
    x0 = pipe.generate_latents(jnp.asarray(golden["latents"]),
                               jnp.asarray(golden["emb"]))
    np.testing.assert_allclose(np.asarray(x0), golden["x0"], atol=5e-4, rtol=1e-3)


def test_config_json_missing_text_encoder_infers_family(tmp_path):
    """An SD2.x-shaped checkpoint dir (unet/config.json with
    cross_attention_dim=1024) whose text_encoder/config.json is missing must
    get the OpenCLIP ViT-H text config, not the SD1.5 default — the
    pre-round-4 sniffing contract, or text-weight conversion crashes on
    shape/key mismatches."""
    import json
    import shutil

    from sid_lsg_tpu.models.configs import SD21_BASE, config_from_hf_json, \
        write_hf_config_jsons

    d = str(tmp_path / "ckpt")
    write_hf_config_jsons(d, SD21_BASE)
    shutil.rmtree(os.path.join(d, "text_encoder"))
    cfg = config_from_hf_json(d)
    assert cfg.text == SD21_BASE.text
    # And an SD1.5-shaped UNet still defaults to the SD1.5 text tower.
    with open(os.path.join(d, "unet", "config.json")) as f:
        uc = json.load(f)
    uc["cross_attention_dim"] = 768
    with open(os.path.join(d, "unet", "config.json"), "w") as f:
        json.dump(uc, f)
    from sid_lsg_tpu.models.configs import SD15
    assert config_from_hf_json(d).text == SD15.text
