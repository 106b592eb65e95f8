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
