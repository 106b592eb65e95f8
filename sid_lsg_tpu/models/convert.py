"""HF torch checkpoint -> Flax pytree converters.

The reference pulls UNet/VAE/text-encoder weights from HF hub repos
(``training/sid_sd_util.py:58-79``) and snapshots them as torch pickles
(``sid_training_loop.py:641-651``).  This module makes those artifacts usable
here: safetensors / torch-pickle state dicts are renamed + re-laid-out
(OIHW conv kernels -> HWIO, (out,in) linear weights -> (in,out)) into the
NHWC Flax modules of ``models/``.

The mapping is generated structurally from the configs so SD1.5, SD2.1-base
and tiny variants all convert with the same code; ``invert=True`` produces
the reverse (flax -> HF names) mapping for checkpoint export parity.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from .configs import CLIPTextConfig, UNetConfig, VAEConfig

Transform = Callable[[np.ndarray], np.ndarray]

_LINEAR: Transform = lambda w: np.ascontiguousarray(w.T)
_CONV: Transform = lambda w: np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))
_ID: Transform = lambda w: w


def _set(tree: dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


# Inverse transforms for checkpoint EXPORT (flax -> HF layout).
_INV = {_LINEAR: lambda w: np.ascontiguousarray(np.asarray(w).T),
        _CONV: lambda w: np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1))),
        _ID: lambda w: np.asarray(w)}


def _flatten_params(tree: dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


class _Mapper:
    """Structural map between HF torch state dicts and Flax pytrees.

    ``invert=False``: read HF keys, build the flax tree (import).
    ``invert=True``: read a flax tree (flattened), emit HF keys (export) —
    the round-trip promised by the module docstring; gated by
    tests/test_convert_roundtrip.py.
    """

    def __init__(self, state_dict: Dict[str, np.ndarray], prefix: str = "",
                 invert: bool = False, flax_params: Optional[dict] = None):
        self.sd = state_dict
        self.prefix = prefix
        self.tree: dict = {}
        self.used: set = set()
        self.invert = invert
        self.flat = _flatten_params(flax_params) if flax_params is not None else {}
        self.out: Dict[str, np.ndarray] = {}

    def has(self, flax_path: str, hf_key: str) -> bool:
        """Presence check valid in both directions."""
        if self.invert:
            return flax_path in self.flat
        return self.prefix + hf_key in self.sd

    def take(self, flax_path: str, hf_key: str, transform: Transform = _ID, optional: bool = False):
        if self.invert:
            if flax_path not in self.flat:
                if optional:
                    return
                raise KeyError(f"missing flax param: {flax_path}")
            self.out[self.prefix + hf_key] = _INV[transform](self.flat[flax_path])
            return
        key = self.prefix + hf_key
        if key not in self.sd:
            if optional:
                return
            raise KeyError(f"missing checkpoint key: {key}")
        _set(self.tree, flax_path, transform(np.asarray(self.sd[key], dtype=np.float32)))
        self.used.add(key)

    def linear(self, flax_path: str, hf_path: str, bias: bool = True, optional: bool = False):
        self.take(f"{flax_path}/kernel", f"{hf_path}.weight", _LINEAR, optional)
        if bias:
            self.take(f"{flax_path}/bias", f"{hf_path}.bias", _ID, optional)

    def conv(self, flax_path: str, hf_path: str, optional: bool = False):
        self.take(f"{flax_path}/kernel", f"{hf_path}.weight", _CONV, optional)
        self.take(f"{flax_path}/bias", f"{hf_path}.bias", _ID, optional)

    def norm(self, flax_path: str, hf_path: str):
        self.take(f"{flax_path}/scale", f"{hf_path}.weight")
        self.take(f"{flax_path}/bias", f"{hf_path}.bias")

    def ln(self, flax_path: str, hf_path: str):
        # LayerNorm32 wraps an inner flax LayerNorm named 'ln'.
        self.take(f"{flax_path}/ln/scale", f"{hf_path}.weight")
        self.take(f"{flax_path}/ln/bias", f"{hf_path}.bias")


def _map_attention(m: _Mapper, flax_path: str, hf_path: str, qkv_bias: bool) -> None:
    m.linear(f"{flax_path}/to_q", f"{hf_path}.to_q", bias=qkv_bias)
    m.linear(f"{flax_path}/to_k", f"{hf_path}.to_k", bias=qkv_bias)
    m.linear(f"{flax_path}/to_v", f"{hf_path}.to_v", bias=qkv_bias)
    m.linear(f"{flax_path}/to_out", f"{hf_path}.to_out.0")


def _map_transformer(m: _Mapper, flax_path: str, hf_path: str, cfg: UNetConfig) -> None:
    m.norm(f"{flax_path}/norm", f"{hf_path}.norm")
    proj = m.linear if cfg.use_linear_projection else m.conv
    proj(f"{flax_path}/proj_in", f"{hf_path}.proj_in")
    proj(f"{flax_path}/proj_out", f"{hf_path}.proj_out")
    for d in range(cfg.transformer_layers_per_block):
        fp = f"{flax_path}/blocks_{d}"
        hp = f"{hf_path}.transformer_blocks.{d}"
        m.ln(f"{fp}/norm1", f"{hp}.norm1")
        m.ln(f"{fp}/norm2", f"{hp}.norm2")
        m.ln(f"{fp}/norm3", f"{hp}.norm3")
        _map_attention(m, f"{fp}/attn1", f"{hp}.attn1", qkv_bias=False)
        _map_attention(m, f"{fp}/attn2", f"{hp}.attn2", qkv_bias=False)
        m.linear(f"{fp}/ff/net_0/proj", f"{hp}.ff.net.0.proj")
        m.linear(f"{fp}/ff/net_2", f"{hp}.ff.net.2")


def _map_resnet(m: _Mapper, flax_path: str, hf_path: str, temb: bool = True) -> None:
    m.norm(f"{flax_path}/norm1", f"{hf_path}.norm1")
    m.conv(f"{flax_path}/conv1", f"{hf_path}.conv1")
    if temb:
        m.linear(f"{flax_path}/time_emb_proj", f"{hf_path}.time_emb_proj", optional=True)
    m.norm(f"{flax_path}/norm2", f"{hf_path}.norm2")
    m.conv(f"{flax_path}/conv2", f"{hf_path}.conv2")
    if m.has(f"{flax_path}/conv_shortcut/kernel", f"{hf_path}.conv_shortcut.weight"):
        m.conv(f"{flax_path}/conv_shortcut", f"{hf_path}.conv_shortcut")


def _run_unet(m: _Mapper, cfg: UNetConfig) -> None:
    n = len(cfg.block_out_channels)
    m.conv("conv_in", "conv_in")
    m.linear("time_embedding/linear_1", "time_embedding.linear_1")
    m.linear("time_embedding/linear_2", "time_embedding.linear_2")
    for i in range(n):
        for j in range(cfg.layers_per_block):
            _map_resnet(m, f"down_{i}_resnet_{j}", f"down_blocks.{i}.resnets.{j}")
            if cfg.cross_attention_levels[i]:
                _map_transformer(m, f"down_{i}_attn_{j}", f"down_blocks.{i}.attentions.{j}", cfg)
        if i < n - 1:
            m.conv(f"down_{i}_downsample/conv", f"down_blocks.{i}.downsamplers.0.conv")
    _map_resnet(m, "mid_resnet_0", "mid_block.resnets.0")
    _map_transformer(m, "mid_attn", "mid_block.attentions.0", cfg)
    _map_resnet(m, "mid_resnet_1", "mid_block.resnets.1")
    for i in range(n):
        k = n - 1 - i  # HF up block index for our level i
        for j in range(cfg.layers_per_block + 1):
            _map_resnet(m, f"up_{i}_resnet_{j}", f"up_blocks.{k}.resnets.{j}")
            if cfg.cross_attention_levels[i]:
                _map_transformer(m, f"up_{i}_attn_{j}", f"up_blocks.{k}.attentions.{j}", cfg)
        if i > 0:
            m.conv(f"up_{i}_upsample/conv", f"up_blocks.{k}.upsamplers.0.conv")
    m.norm("conv_norm_out", "conv_norm_out")
    m.conv("conv_out", "conv_out")


def convert_unet(state_dict: Dict[str, np.ndarray], cfg: UNetConfig) -> dict:
    m = _Mapper(state_dict)
    _run_unet(m, cfg)
    return m.tree


def export_unet(params: dict, cfg: UNetConfig) -> Dict[str, np.ndarray]:
    """Flax UNet params -> HF-layout torch-style state dict (numpy)."""
    m = _Mapper({}, invert=True, flax_params=params)
    _run_unet(m, cfg)
    return m.out


def _map_vae_attn(m: _Mapper, flax_path: str, hf_path: str) -> None:
    m.norm(f"{flax_path}/group_norm", f"{hf_path}.group_norm")
    if m.invert or f"{m.prefix}{hf_path}.to_q.weight" in m.sd:
        _map_attention(m, f"{flax_path}/attn", hf_path, qkv_bias=True)
    else:  # older diffusers naming: query/key/value/proj_attn
        m.linear(f"{flax_path}/attn/to_q", f"{hf_path}.query")
        m.linear(f"{flax_path}/attn/to_k", f"{hf_path}.key")
        m.linear(f"{flax_path}/attn/to_v", f"{hf_path}.value")
        m.linear(f"{flax_path}/attn/to_out", f"{hf_path}.proj_attn")


def _run_vae(m: _Mapper, cfg: VAEConfig) -> None:
    n = len(cfg.block_out_channels)
    # Encoder.
    m.conv("encoder/conv_in", "encoder.conv_in")
    for i in range(n):
        for j in range(cfg.layers_per_block):
            _map_resnet(m, f"encoder/down_{i}_resnet_{j}", f"encoder.down_blocks.{i}.resnets.{j}", temb=False)
        if i < n - 1:
            m.conv(f"encoder/down_{i}_downsample/conv", f"encoder.down_blocks.{i}.downsamplers.0.conv")
    _map_resnet(m, "encoder/mid_resnet_0", "encoder.mid_block.resnets.0", temb=False)
    _map_vae_attn(m, "encoder/mid_attn", "encoder.mid_block.attentions.0")
    _map_resnet(m, "encoder/mid_resnet_1", "encoder.mid_block.resnets.1", temb=False)
    m.norm("encoder/conv_norm_out", "encoder.conv_norm_out")
    m.conv("encoder/conv_out", "encoder.conv_out")
    # Decoder.
    m.conv("decoder/conv_in", "decoder.conv_in")
    _map_resnet(m, "decoder/mid_resnet_0", "decoder.mid_block.resnets.0", temb=False)
    _map_vae_attn(m, "decoder/mid_attn", "decoder.mid_block.attentions.0")
    _map_resnet(m, "decoder/mid_resnet_1", "decoder.mid_block.resnets.1", temb=False)
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            _map_resnet(m, f"decoder/up_{i}_resnet_{j}", f"decoder.up_blocks.{i}.resnets.{j}", temb=False)
        if i < n - 1:
            m.conv(f"decoder/up_{i}_upsample/conv", f"decoder.up_blocks.{i}.upsamplers.0.conv")
    m.norm("decoder/conv_norm_out", "decoder.conv_norm_out")
    m.conv("decoder/conv_out", "decoder.conv_out")
    m.conv("quant_conv", "quant_conv")
    m.conv("post_quant_conv", "post_quant_conv")


def convert_vae(state_dict: Dict[str, np.ndarray], cfg: VAEConfig) -> dict:
    m = _Mapper(state_dict)
    _run_vae(m, cfg)
    return m.tree


def export_vae(params: dict, cfg: VAEConfig) -> Dict[str, np.ndarray]:
    m = _Mapper({}, invert=True, flax_params=params)
    _run_vae(m, cfg)
    return m.out


def _run_clip_text(m: _Mapper, cfg: CLIPTextConfig) -> None:
    m.take("token_embedding/embedding", "embeddings.token_embedding.weight")
    m.take("position_embedding/embedding", "embeddings.position_embedding.weight")
    for i in range(cfg.num_hidden_layers):
        fp = f"layers_{i}"
        hp = f"encoder.layers.{i}"
        m.ln(f"{fp}/layer_norm1", f"{hp}.layer_norm1")
        m.ln(f"{fp}/layer_norm2", f"{hp}.layer_norm2")
        m.linear(f"{fp}/self_attn/to_q", f"{hp}.self_attn.q_proj")
        m.linear(f"{fp}/self_attn/to_k", f"{hp}.self_attn.k_proj")
        m.linear(f"{fp}/self_attn/to_v", f"{hp}.self_attn.v_proj")
        m.linear(f"{fp}/self_attn/to_out", f"{hp}.self_attn.out_proj")
        m.linear(f"{fp}/fc1", f"{hp}.mlp.fc1")
        m.linear(f"{fp}/fc2", f"{hp}.mlp.fc2")
    m.ln("final_layer_norm", "final_layer_norm")


def convert_clip_text(state_dict: Dict[str, np.ndarray], cfg: CLIPTextConfig) -> dict:
    m = _Mapper(state_dict, prefix="text_model." if any(
        k.startswith("text_model.") for k in state_dict) else "")
    _run_clip_text(m, cfg)
    return m.tree


def export_clip_text(params: dict, cfg: CLIPTextConfig) -> Dict[str, np.ndarray]:
    m = _Mapper({}, prefix="text_model.", invert=True, flax_params=params)
    _run_clip_text(m, cfg)
    return m.out


# ---------------------------------------------------------------------------
# Checkpoint file loading


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out: Dict[str, np.ndarray] = {}
    with safe_open(path, framework="numpy") as f:
        for key in f.keys():
            t = f.get_tensor(key)
            if t.dtype not in (np.float32, np.float64):
                t = t.astype(np.float32)
            out[key] = t
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.float().numpy() for k, v in obj.items() if hasattr(v, "numpy")}


def _find_weights(subdir: str) -> str:
    for name in (
        "diffusion_pytorch_model.safetensors",
        "model.safetensors",
        "diffusion_pytorch_model.bin",
        "pytorch_model.bin",
    ):
        p = os.path.join(subdir, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no weight file under {subdir}")


def _load_any(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        return load_safetensors(path)
    return load_torch_state_dict(path)


def load_sd_checkpoint(model_dir: str, sd_cfg) -> Tuple[dict, dict, dict]:
    """Local SD checkpoint dir (HF layout: unet/ vae/ text_encoder/) -> params."""
    unet = convert_unet(_load_any(_find_weights(os.path.join(model_dir, "unet"))), sd_cfg.unet)
    vae = convert_vae(_load_any(_find_weights(os.path.join(model_dir, "vae"))), sd_cfg.vae)
    text = convert_clip_text(
        _load_any(_find_weights(os.path.join(model_dir, "text_encoder"))), sd_cfg.text
    )
    return unet, vae, text


# ---------------------------------------------------------------------------
# EDM legacy nets (SongUNet / DhariwalUNet, reference training/networks.py)


def convert_edm_unet(state_dict: Dict[str, np.ndarray]) -> dict:
    """EDM torch state dict -> ``models.edm_networks`` Flax params.

    Handles both SongUNet and DhariwalUNet (reference training/networks.py:
    229-467): ``enc.16x16_block0.*`` torch module paths become
    ``enc_16_block0/*`` Flax scopes, OIHW conv kernels -> HWIO, (out,in)
    linears -> (in,out), GroupNorm ``weight`` -> ``scale``.  A leading
    ``model.`` prefix (preconditioner-wrapped nets) is stripped; constant
    ``resample_filter`` buffers are dropped (the Flax modules rebuild them).
    """
    tree: dict = {}
    for key, w in state_dict.items():
        w = np.asarray(w, dtype=np.float32)
        parts = key.split(".")
        if parts[0] == "model":
            parts = parts[1:]
        if parts[-1] == "resample_filter" or parts[0] == "u":
            continue
        if parts[0] in ("enc", "dec"):
            res, suffix = parts[1].split("x")[0], parts[1].split("_", 1)[1]
            mods = [f"{parts[0]}_{res}_{suffix}"] + parts[2:-1]
        else:
            mods = parts[:-1]
        leaf = parts[-1]
        if leaf == "weight":
            if w.ndim == 4:
                leaf, w = "kernel", np.transpose(w, (2, 3, 1, 0))
            elif w.ndim == 2:
                leaf, w = "kernel", w.T
            else:
                leaf = "scale"  # GroupNorm gain
        _set(tree, "/".join(mods + [leaf]), np.ascontiguousarray(w))
    return tree
