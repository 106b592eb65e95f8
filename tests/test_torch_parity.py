"""Numerical parity gates against the baked-in torch packages.

SURVEY.md §7 hard part #1: FID/CLIP parity hinges on exact module semantics.
diffusers isn't installed here, but ``transformers`` is — so the CLIP text
encoder (which feeds EVERY UNet call) is verified end-to-end against the
reference implementation the reference itself loads at sid_sd_util.py:70.
Also covers the torch-pickle interop path used for reference snapshots.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def hf_clip_pair():
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    from sid_lsg_tpu.models.configs import CLIPTextConfig
    from sid_lsg_tpu.models.convert import convert_clip_text

    cfg = CLIPTextConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, max_position_embeddings=16,
        hidden_act="quick_gelu",
    )
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="quick_gelu", attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf_model = HFModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = convert_clip_text(sd, cfg)
    return hf_model, params, cfg


def test_clip_text_parity(hf_clip_pair):
    import jax.numpy as jnp

    from sid_lsg_tpu.models.clip_text import CLIPTextModel

    hf_model, params, cfg = hf_clip_pair
    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab_size, size=(3, cfg.max_position_embeddings))
    with torch.no_grad():
        ref = hf_model(torch.as_tensor(ids)).last_hidden_state.numpy()
    ours = np.asarray(CLIPTextModel(cfg).apply({"params": params}, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_clip_text_parity_gelu_variant():
    """SD2.x tower: gelu activation path."""
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    import jax.numpy as jnp

    from sid_lsg_tpu.models.clip_text import CLIPTextModel
    from sid_lsg_tpu.models.configs import CLIPTextConfig
    from sid_lsg_tpu.models.convert import convert_clip_text

    cfg = CLIPTextConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=8,
        hidden_act="gelu",
    )
    torch.manual_seed(1)
    hf_model = HFModel(
        HFConfig(
            vocab_size=64, hidden_size=16, intermediate_size=32,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=8, hidden_act="gelu",
        )
    ).eval()
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = convert_clip_text(sd, cfg)
    ids = np.random.RandomState(1).randint(0, 64, size=(2, 8))
    with torch.no_grad():
        ref = hf_model(torch.as_tensor(ids)).last_hidden_state.numpy()
    ours = np.asarray(CLIPTextModel(cfg).apply({"params": params}, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_clip_vision_parity(act):
    """Vision tower vs transformers CLIPVisionModelWithProjection (the last
    offline-parity-testable model, VERDICT r2 #4): pooled+projected image
    embeds, both activation variants, including the [0,1]->OPENAI-norm
    preprocessing baked into our tower."""
    import jax.numpy as jnp
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection as HFModel

    from sid_lsg_tpu.models.clip_vision import (
        OPENAI_MEAN, OPENAI_STD, CLIPVisionConfig, CLIPVisionModel,
        convert_hf_clip_vision,
    )

    cfg = CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, projection_dim=16,
        hidden_act=act,
    )
    torch.manual_seed(0)
    hf = HFModel(HFConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, projection_dim=16,
        hidden_act=act, attention_dropout=0.0,
    )).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_hf_clip_vision(sd, cfg)
    pixels01 = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    normed = (pixels01 - np.asarray(OPENAI_MEAN)) / np.asarray(OPENAI_STD)
    with torch.no_grad():
        ref = hf(pixel_values=torch.as_tensor(
            normed.transpose(0, 3, 1, 2).astype(np.float32)
        )).image_embeds.numpy()
    ours = np.asarray(CLIPVisionModel(cfg).apply({"params": params}, jnp.asarray(pixels01)))
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


def test_open_clip_converter_layout():
    """convert_open_clip (visual.*/transformer.resblocks.* key layout) against
    a synthetic open_clip-shaped state dict assembled from HF CLIP weights:
    the converted trees must match the independently-gated HF converters
    leaf-for-leaf (VERDICT r2 #4, second half)."""
    import jax

    from transformers import CLIPTextConfig as HFTextConfig
    from transformers import CLIPTextModel as HFTextModel
    from transformers import CLIPVisionConfig as HFVisConfig
    from transformers import CLIPVisionModelWithProjection as HFVisModel

    from sid_lsg_tpu.models.clip_vision import (
        CLIPConfig, CLIPVisionConfig, convert_hf_clip_vision, convert_open_clip,
    )
    from sid_lsg_tpu.models.configs import CLIPTextConfig
    from sid_lsg_tpu.models.convert import convert_clip_text

    vis_cfg = CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, projection_dim=16,
        hidden_act="gelu",
    )
    txt_cfg = CLIPTextConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=8,
        hidden_act="gelu",
    )
    cc = CLIPConfig(vision=vis_cfg, text=txt_cfg, projection_dim=16)
    torch.manual_seed(2)
    hf_v = HFVisModel(HFVisConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, projection_dim=16,
        hidden_act="gelu", attention_dropout=0.0,
    )).eval()
    hf_t = HFTextModel(HFTextConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=8,
        hidden_act="gelu", attention_dropout=0.0,
    )).eval()
    sd_v = {k: v.detach().numpy() for k, v in hf_v.state_dict().items()}
    sd_t = {k: v.detach().numpy() for k, v in hf_t.state_dict().items()}

    # Assemble the open_clip-shaped dict from the same weights.
    oc = {}
    oc["visual.conv1.weight"] = sd_v["vision_model.embeddings.patch_embedding.weight"]
    oc["visual.class_embedding"] = sd_v["vision_model.embeddings.class_embedding"]
    oc["visual.positional_embedding"] = sd_v["vision_model.embeddings.position_embedding.weight"]
    oc["visual.ln_pre.weight"] = sd_v["vision_model.pre_layrnorm.weight"]
    oc["visual.ln_pre.bias"] = sd_v["vision_model.pre_layrnorm.bias"]
    oc["visual.ln_post.weight"] = sd_v["vision_model.post_layernorm.weight"]
    oc["visual.ln_post.bias"] = sd_v["vision_model.post_layernorm.bias"]
    oc["visual.proj"] = sd_v["visual_projection.weight"].T
    for i in range(2):
        hp = f"vision_model.encoder.layers.{i}"
        op = f"visual.transformer.resblocks.{i}"
        oc[f"{op}.ln_1.weight"] = sd_v[f"{hp}.layer_norm1.weight"]
        oc[f"{op}.ln_1.bias"] = sd_v[f"{hp}.layer_norm1.bias"]
        oc[f"{op}.ln_2.weight"] = sd_v[f"{hp}.layer_norm2.weight"]
        oc[f"{op}.ln_2.bias"] = sd_v[f"{hp}.layer_norm2.bias"]
        oc[f"{op}.attn.in_proj_weight"] = np.concatenate(
            [sd_v[f"{hp}.self_attn.{n}_proj.weight"] for n in "qkv"], axis=0)
        oc[f"{op}.attn.in_proj_bias"] = np.concatenate(
            [sd_v[f"{hp}.self_attn.{n}_proj.bias"] for n in "qkv"], axis=0)
        oc[f"{op}.attn.out_proj.weight"] = sd_v[f"{hp}.self_attn.out_proj.weight"]
        oc[f"{op}.attn.out_proj.bias"] = sd_v[f"{hp}.self_attn.out_proj.bias"]
        oc[f"{op}.mlp.c_fc.weight"] = sd_v[f"{hp}.mlp.fc1.weight"]
        oc[f"{op}.mlp.c_fc.bias"] = sd_v[f"{hp}.mlp.fc1.bias"]
        oc[f"{op}.mlp.c_proj.weight"] = sd_v[f"{hp}.mlp.fc2.weight"]
        oc[f"{op}.mlp.c_proj.bias"] = sd_v[f"{hp}.mlp.fc2.bias"]
    oc["token_embedding.weight"] = sd_t["text_model.embeddings.token_embedding.weight"]
    oc["positional_embedding"] = sd_t["text_model.embeddings.position_embedding.weight"]
    oc["ln_final.weight"] = sd_t["text_model.final_layer_norm.weight"]
    oc["ln_final.bias"] = sd_t["text_model.final_layer_norm.bias"]
    oc["text_projection"] = np.random.RandomState(3).randn(16, 16).astype(np.float32)
    for i in range(2):
        hp = f"text_model.encoder.layers.{i}"
        op = f"transformer.resblocks.{i}"
        oc[f"{op}.ln_1.weight"] = sd_t[f"{hp}.layer_norm1.weight"]
        oc[f"{op}.ln_1.bias"] = sd_t[f"{hp}.layer_norm1.bias"]
        oc[f"{op}.ln_2.weight"] = sd_t[f"{hp}.layer_norm2.weight"]
        oc[f"{op}.ln_2.bias"] = sd_t[f"{hp}.layer_norm2.bias"]
        oc[f"{op}.attn.in_proj_weight"] = np.concatenate(
            [sd_t[f"{hp}.self_attn.{n}_proj.weight"] for n in "qkv"], axis=0)
        oc[f"{op}.attn.in_proj_bias"] = np.concatenate(
            [sd_t[f"{hp}.self_attn.{n}_proj.bias"] for n in "qkv"], axis=0)
        oc[f"{op}.attn.out_proj.weight"] = sd_t[f"{hp}.self_attn.out_proj.weight"]
        oc[f"{op}.attn.out_proj.bias"] = sd_t[f"{hp}.self_attn.out_proj.bias"]
        oc[f"{op}.mlp.c_fc.weight"] = sd_t[f"{hp}.mlp.fc1.weight"]
        oc[f"{op}.mlp.c_fc.bias"] = sd_t[f"{hp}.mlp.fc1.bias"]
        oc[f"{op}.mlp.c_proj.weight"] = sd_t[f"{hp}.mlp.fc2.weight"]
        oc[f"{op}.mlp.c_proj.bias"] = sd_t[f"{hp}.mlp.fc2.bias"]

    params = convert_open_clip(oc, cc)
    ref_vision = convert_hf_clip_vision(sd_v, vis_cfg)
    ref_text = convert_clip_text(sd_t, txt_cfg)

    def assert_tree_equal(a, b, tag):
        la, lb = jax.tree_util.tree_leaves_with_path(a), jax.tree_util.tree_leaves_with_path(b)
        assert [p for p, _ in la] == [p for p, _ in lb], f"{tag}: tree structure differs"
        for (path, x), (_, y) in zip(la, lb):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=f"{tag}{jax.tree_util.keystr(path)}"
            )

    assert_tree_equal(params["vision"], ref_vision, "vision")
    assert_tree_equal(params["text"], ref_text, "text")
    np.testing.assert_array_equal(params["text_projection"], oc["text_projection"])


def test_hf_tokenizer_parity_if_vocab_available():
    """Our BPE tokenizer == HF CLIPTokenizer when a vocab is present locally."""
    from transformers.models.clip.tokenization_clip import CLIPTokenizer as HFTok

    try:
        hf = HFTok.from_pretrained("openai/clip-vit-base-patch32")
    except Exception:
        pytest.skip("no local HF tokenizer files (offline)")
    import tempfile

    d = tempfile.mkdtemp()
    hf.save_vocabulary(d)
    from sid_lsg_tpu.models.tokenizer import CLIPTokenizer

    ours = CLIPTokenizer(d)
    prompts = ["a photo of a cat", "The QUICK brown fox, isn't it?"]
    ref = hf(prompts, padding="max_length", max_length=77, truncation=True)["input_ids"]
    np.testing.assert_array_equal(ours(prompts), np.asarray(ref))


class _Sub(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.lin = torch.nn.Linear(4, 3)
        self.register_buffer("scale", torch.ones(3))


class _Net(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.sub = _Sub()
        self.conv = torch.nn.Conv2d(2, 2, 1)


def test_torch_pickle_interop(tmp_path):
    """Reference-style module pickles load without the source packages."""
    from sid_lsg_tpu.runtime import torch_pickle_state_dict

    torch.manual_seed(0)
    net = _Net()
    path = str(tmp_path / "snap.pkl")
    torch.save({"ema": net}, path)
    sd = torch_pickle_state_dict(path)
    assert set(sd) == {
        "sub.lin.weight", "sub.lin.bias", "sub.scale", "conv.weight", "conv.bias"
    }
    np.testing.assert_allclose(sd["sub.lin.weight"], net.sub.lin.weight.detach().numpy())
