"""CLIP vision tower + joint image/text scorer — the CLIP-score metric model.

Role of reference ``networks/clip.py`` (open_clip ViT-g-14 wrapper used by the
metric stack, ``sid_metric_utils.py:36,80-90``): bicubic resize + CLIP
normalisation, joint image/text unit-norm features, cosine score.  Implemented
natively in Flax (no open_clip/timm dependency): a standard CLIP ViT (patch
conv, class token, pre-LN transformer, post-LN, linear projection) over the
existing causal ``CLIPTextModel`` with EOT pooling + text projection.

``VIT_G_14`` matches laion2b ViT-g-14 (the reference's metric detector);
``TINY_CLIP`` is the test preset.  ``convert_open_clip`` maps an open_clip
state dict (visual.* / transformer.resblocks.*) for weight parity.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .clip_text import CLIPTextModel, _act
from .configs import CLIPTextConfig
from .layers import Attention, LayerNorm32

OPENAI_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_STD = (0.26862954, 0.26130258, 0.27577711)


def openclip_preprocess_uint8(images_uint8, size: int,
                              workers: int | None = None) -> np.ndarray:
    """open_clip's inference image transform, exactly, on host.

    torchvision ``Resize(size)`` (shorter side -> ``size``, PIL bicubic — a
    support-scaled, antialiased convolution resampler) followed by
    ``CenterCrop(size)``; returns float32 pixels in [0, 1].  This is the
    preprocessing the hpsv2 package applies before scoring
    (``/root/reference/generate_hpsv2.py:190-192`` scores PIL images through
    ``hpsv2.score``); the in-graph ``jax.image.resize`` bicubic is NOT
    antialiased on downscale and measurably disagrees with it, so host-fed
    uint8 images take this path (TODO.md round-3 closure).

    ``workers``: PIL releases the GIL inside the C resample, so at ~24 ms/img
    (512px -> 224) the batch loop thread-pools across real cores.  Default
    ``os.cpu_count()`` capped at 8; the per-image math is unchanged (each
    thread writes only its own output row), so results are byte-identical
    to the serial loop at any worker count.
    """
    from PIL import Image

    arr = np.asarray(images_uint8)
    out = np.empty((len(arr), size, size, 3), np.float32)

    def one(i: int) -> None:
        im = Image.fromarray(arr[i])
        w, h = im.size
        if w <= h:  # torchvision _compute_resized_output_size (int truncation)
            nw, nh = size, max(int(size * h / w), size)
        else:
            nh, nw = size, max(int(size * w / h), size)
        im = im.resize((nw, nh), Image.BICUBIC)
        left, top = (nw - size) // 2, (nh - size) // 2
        im = im.crop((left, top, left + size, top + size))
        out[i] = np.asarray(im, np.float32) / 255.0

    nw_ = workers if workers is not None else min(8, os.cpu_count() or 1)
    if nw_ <= 1 or len(arr) <= 1:
        for i in range(len(arr)):
            one(i)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=nw_) as pool:
            list(pool.map(one, range(len(arr))))
    return out


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1408
    intermediate_size: int = 6144
    num_hidden_layers: int = 40
    num_attention_heads: int = 16
    projection_dim: int = 1024
    layer_norm_eps: float = 1e-5
    # 'gelu' (open_clip ViT-g/H towers) | 'quick_gelu' (OpenAI ViT-L towers,
    # the transformers CLIPVisionConfig default).
    hidden_act: str = "gelu"


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    vision: CLIPVisionConfig
    text: CLIPTextConfig
    projection_dim: int


# laion2b_s12b_b42k ViT-g-14 (reference metric detector).
VIT_G_14 = CLIPConfig(
    vision=CLIPVisionConfig(),
    text=CLIPTextConfig(
        hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
        num_attention_heads=16, hidden_act="gelu",
    ),
    projection_dim=1024,
)

# ViT-H-14 — the tower HPSv2 fine-tunes (reference generate_hpsv2.py:190-192
# scores through the hpsv2 package, which wraps open_clip ViT-H-14).
VIT_H_14 = CLIPConfig(
    vision=CLIPVisionConfig(
        hidden_size=1280, intermediate_size=5120, num_hidden_layers=32,
        num_attention_heads=16, projection_dim=1024,
    ),
    text=CLIPTextConfig(
        hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
        num_attention_heads=16, hidden_act="gelu",
    ),
    projection_dim=1024,
)


def config_from_open_clip(state_dict) -> CLIPConfig:
    """Derive the CLIPConfig from an open_clip checkpoint's own shapes, so
    any ViT tower (g-14 for metrics, H-14 for HPSv2, tiny for tests) converts
    without a preset guess."""
    sd_shape = lambda k: tuple(np.shape(state_dict[k]))
    width = sd_shape("visual.class_embedding")[0]
    n_pos = sd_shape("visual.positional_embedding")[0]
    patch = sd_shape("visual.conv1.weight")[2]
    grid = int(round((n_pos - 1) ** 0.5))
    layer_idx = lambda prefix: 1 + max(
        int(k.split(".")[3]) for k in state_dict
        if k.startswith(prefix) and k.endswith(".ln_1.weight")
    )
    vis_layers = layer_idx("visual.transformer.resblocks.")
    txt_layers = 1 + max(
        int(k.split(".")[2]) for k in state_dict
        if k.startswith("transformer.resblocks.") and k.endswith(".ln_1.weight")
    )
    txt_width = sd_shape("ln_final.weight")[0]
    embed_dim = sd_shape("text_projection")[1]
    # Head count is not derivable from fused-qkv shapes; open_clip ViTs use
    # 64-dim heads except H-14 (1280/16=80) and g-14 (1408/16=88).
    vis_heads = 16 if width in (1280, 1408) else max(width // 64, 1)
    return CLIPConfig(
        vision=CLIPVisionConfig(
            image_size=grid * patch, patch_size=patch, hidden_size=width,
            intermediate_size=sd_shape(
                "visual.transformer.resblocks.0.mlp.c_fc.weight")[0],
            num_hidden_layers=vis_layers, num_attention_heads=vis_heads,
            projection_dim=sd_shape("visual.proj")[1],
        ),
        text=CLIPTextConfig(
            vocab_size=sd_shape("token_embedding.weight")[0],
            hidden_size=txt_width,
            intermediate_size=sd_shape("transformer.resblocks.0.mlp.c_fc.weight")[0],
            num_hidden_layers=txt_layers,
            num_attention_heads=max(txt_width // 64, 1),
            max_position_embeddings=sd_shape("positional_embedding")[0],
            hidden_act="gelu",
        ),
        projection_dim=embed_dim,
    )

TINY_CLIP = CLIPConfig(
    vision=CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, projection_dim=16,
    ),
    text=CLIPTextConfig(
        vocab_size=1000, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
    ),
    projection_dim=16,
)


class CLIPVisionLayer(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_attention_heads
        h = LayerNorm32(cfg.layer_norm_eps, dtype=self.dtype, name="ln_1")(x)
        x = x + Attention(
            cfg.num_attention_heads, head_dim, use_bias=True, dtype=self.dtype,
            name="attn",
        )(h)
        h = LayerNorm32(cfg.layer_norm_eps, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        h = _act(cfg.hidden_act)(h.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPVisionModel(nn.Module):
    """Pixels in [0,1] (B,H,W,3) -> projected image embedding (B, proj)."""

    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        mean = jnp.asarray(OPENAI_MEAN)
        std = jnp.asarray(OPENAI_STD)
        x = (pixels.astype(jnp.float32) - mean) / std
        if x.shape[1] != cfg.image_size:
            x = jax.image.resize(
                x, (x.shape[0], cfg.image_size, cfg.image_size, 3), method="bicubic"
            )
        x = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
            dtype=self.dtype, name="patch_embed",
        )(x.astype(self.dtype))
        b, gh, gw, c = x.shape
        x = x.reshape(b, gh * gw, c)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (c,), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c)), x], axis=1)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.02),
            (gh * gw + 1, c), jnp.float32,
        )
        x = x + pos.astype(self.dtype)[None]
        x = LayerNorm32(cfg.layer_norm_eps, dtype=self.dtype, name="ln_pre")(x)
        for i in range(cfg.num_hidden_layers):
            x = CLIPVisionLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
        pooled = LayerNorm32(cfg.layer_norm_eps, dtype=self.dtype, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (c, cfg.projection_dim), jnp.float32
        )
        return pooled.astype(jnp.float32) @ proj


class CLIPScorer:
    """Joint image/text features + cosine CLIP score (metric-stack surface)."""

    def __init__(self, config: CLIPConfig = TINY_CLIP, params: Optional[dict] = None,
                 tokenizer=None, seed: int = 0, dtype=jnp.float32):
        self.config = config
        self.vision = CLIPVisionModel(config.vision, dtype=dtype)
        self.text = CLIPTextModel(config.text, dtype=dtype)
        if tokenizer is None:
            from .tokenizer import HashTokenizer

            # model_max_length MUST match the tower's position table: longer
            # ids index past it (OOB gather -> NaN fill under jit).
            tokenizer = HashTokenizer(
                vocab_size=config.text.vocab_size,
                model_max_length=config.text.max_position_embeddings,
            )
        self.tokenizer = tokenizer
        if params is None:
            r1, r2 = jax.random.split(jax.random.PRNGKey(seed))
            v = self.vision.init(
                r1, jnp.zeros((1, config.vision.image_size, config.vision.image_size, 3))
            )["params"]
            t = self.text.init(
                r2, jnp.zeros((1, config.text.max_position_embeddings), jnp.int32)
            )["params"]
            text_proj = jax.random.normal(
                jax.random.PRNGKey(seed + 1),
                (config.text.hidden_size, config.projection_dim),
            ) * config.text.hidden_size ** -0.5
            params = {"vision": v, "text": t, "text_projection": text_proj}
        self.params = params
        self._jimg = jax.jit(self._image_features)
        self._jtxt = jax.jit(self._text_features)

    def _image_features(self, params, pixels01):
        f = self.vision.apply({"params": params["vision"]}, pixels01)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def _text_features(self, params, ids):
        h = self.text.apply({"params": params["text"]}, ids)  # (B, L, D)
        eot = jnp.argmax(ids == self.tokenizer.eos_token_id, axis=-1)
        pooled = h[jnp.arange(h.shape[0]), eot]
        f = pooled.astype(jnp.float32) @ params["text_projection"]
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def image_features(self, images_uint8: np.ndarray) -> jnp.ndarray:
        """uint8 HWC images -> unit-norm projected features.

        Host uint8 inputs whose spatial size differs from the tower's are
        preprocessed with the exact open_clip transform (PIL bicubic
        antialiased short-side resize + center crop) rather than the
        in-graph jax.image.resize, matching hpsv2/open_clip scoring.
        """
        images = np.asarray(images_uint8)
        size = self.config.vision.image_size
        if images.dtype == np.uint8 and images.shape[1:3] != (size, size):
            pixels01 = openclip_preprocess_uint8(images, size)
        else:
            pixels01 = images.astype(np.float32) / 255.0
        return self._jimg(self.params, jnp.asarray(pixels01))

    def text_features(self, prompts: Sequence[str]) -> jnp.ndarray:
        return self._jtxt(self.params, jnp.asarray(self.tokenizer(list(prompts))))

    def score(self, images_uint8: np.ndarray, prompts: Sequence[str]) -> jnp.ndarray:
        """Per-sample cosine similarity (the 'clip_score' the reference sums,
        sid_metric_utils.py:500-504)."""
        fi = self.image_features(images_uint8)
        ft = self.text_features(prompts)
        return jnp.sum(fi * ft, axis=-1)


# ---------------------------------------------------------------------------
# transformers CLIPVisionModelWithProjection state-dict conversion — the
# offline torch-parity gate for the vision tower (the text tower already has
# this gate via models.convert.convert_clip_text).


def convert_hf_clip_vision(state_dict, config: CLIPVisionConfig) -> dict:
    """Map a transformers ``CLIPVisionModelWithProjection`` state dict
    (vision_model.* / visual_projection.*) to ``CLIPVisionModel`` params."""
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in state_dict.items()}
    t = lambda w: np.ascontiguousarray(w.T)
    ln = lambda p: {"ln": {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}}

    def layer(i: int) -> dict:
        p = f"vision_model.encoder.layers.{i}"
        dense = lambda n: {"kernel": t(sd[f"{p}.{n}.weight"]), "bias": sd[f"{p}.{n}.bias"]}
        return {
            "ln_1": ln(f"{p}.layer_norm1"),
            "ln_2": ln(f"{p}.layer_norm2"),
            "attn": {
                "to_q": dense("self_attn.q_proj"),
                "to_k": dense("self_attn.k_proj"),
                "to_v": dense("self_attn.v_proj"),
                "to_out": dense("self_attn.out_proj"),
            },
            "mlp_fc1": dense("mlp.fc1"),
            "mlp_fc2": dense("mlp.fc2"),
        }

    # HF spells it 'pre_layrnorm' (upstream typo kept for checkpoint compat).
    pre_key = ("vision_model.pre_layrnorm"
               if "vision_model.pre_layrnorm.weight" in sd
               else "vision_model.pre_layernorm")
    params = {
        "patch_embed": {"kernel": np.transpose(
            sd["vision_model.embeddings.patch_embedding.weight"], (2, 3, 1, 0))},
        "class_embedding": sd["vision_model.embeddings.class_embedding"],
        "positional_embedding": sd["vision_model.embeddings.position_embedding.weight"],
        "ln_pre": ln(pre_key),
        "ln_post": ln("vision_model.post_layernorm"),
        "proj": t(sd["visual_projection.weight"]),
    }
    for i in range(config.num_hidden_layers):
        params[f"layers_{i}"] = layer(i)
    return params


# ---------------------------------------------------------------------------
# open_clip state-dict conversion (visual.* / transformer.resblocks.*)


def convert_open_clip(state_dict, config: CLIPConfig) -> dict:
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in state_dict.items()}
    t = lambda w: np.ascontiguousarray(w.T)

    def vis_layer(i: int) -> dict:
        p = f"visual.transformer.resblocks.{i}"
        qkv_w = sd[f"{p}.attn.in_proj_weight"]
        qkv_b = sd[f"{p}.attn.in_proj_bias"]
        d = qkv_w.shape[0] // 3
        return {
            "ln_1": {"ln": {"scale": sd[f"{p}.ln_1.weight"], "bias": sd[f"{p}.ln_1.bias"]}},
            "ln_2": {"ln": {"scale": sd[f"{p}.ln_2.weight"], "bias": sd[f"{p}.ln_2.bias"]}},
            "attn": {
                "to_q": {"kernel": t(qkv_w[:d]), "bias": qkv_b[:d]},
                "to_k": {"kernel": t(qkv_w[d : 2 * d]), "bias": qkv_b[d : 2 * d]},
                "to_v": {"kernel": t(qkv_w[2 * d :]), "bias": qkv_b[2 * d :]},
                "to_out": {"kernel": t(sd[f"{p}.attn.out_proj.weight"]),
                           "bias": sd[f"{p}.attn.out_proj.bias"]},
            },
            "mlp_fc1": {"kernel": t(sd[f"{p}.mlp.c_fc.weight"]), "bias": sd[f"{p}.mlp.c_fc.bias"]},
            "mlp_fc2": {"kernel": t(sd[f"{p}.mlp.c_proj.weight"]), "bias": sd[f"{p}.mlp.c_proj.bias"]},
        }

    def txt_layer(i: int) -> dict:
        p = f"transformer.resblocks.{i}"
        qkv_w = sd[f"{p}.attn.in_proj_weight"]
        qkv_b = sd[f"{p}.attn.in_proj_bias"]
        d = qkv_w.shape[0] // 3
        return {
            "layer_norm1": {"ln": {"scale": sd[f"{p}.ln_1.weight"], "bias": sd[f"{p}.ln_1.bias"]}},
            "layer_norm2": {"ln": {"scale": sd[f"{p}.ln_2.weight"], "bias": sd[f"{p}.ln_2.bias"]}},
            "self_attn": {
                "to_q": {"kernel": t(qkv_w[:d]), "bias": qkv_b[:d]},
                "to_k": {"kernel": t(qkv_w[d : 2 * d]), "bias": qkv_b[d : 2 * d]},
                "to_v": {"kernel": t(qkv_w[2 * d :]), "bias": qkv_b[2 * d :]},
                "to_out": {"kernel": t(sd[f"{p}.attn.out_proj.weight"]),
                           "bias": sd[f"{p}.attn.out_proj.bias"]},
            },
            "fc1": {"kernel": t(sd[f"{p}.mlp.c_fc.weight"]), "bias": sd[f"{p}.mlp.c_fc.bias"]},
            "fc2": {"kernel": t(sd[f"{p}.mlp.c_proj.weight"]), "bias": sd[f"{p}.mlp.c_proj.bias"]},
        }

    vision = {
        "patch_embed": {"kernel": np.transpose(sd["visual.conv1.weight"], (2, 3, 1, 0))},
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": {"ln": {"scale": sd["visual.ln_pre.weight"], "bias": sd["visual.ln_pre.bias"]}},
        "ln_post": {"ln": {"scale": sd["visual.ln_post.weight"], "bias": sd["visual.ln_post.bias"]}},
        "proj": sd["visual.proj"],
    }
    for i in range(config.vision.num_hidden_layers):
        vision[f"layers_{i}"] = vis_layer(i)
    text = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "position_embedding": {"embedding": sd["positional_embedding"]},
        "final_layer_norm": {"ln": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]}},
    }
    for i in range(config.text.num_hidden_layers):
        text[f"layers_{i}"] = txt_layer(i)
    return {"vision": vision, "text": text, "text_projection": sd["text_projection"]}
