"""Independent pure-torch reimplementation of the SiD-LSG composed step.

This module is the torch side of the composed-step cross-implementation gate
(``test_composed_step_gate.py``, VERDICT r3 #1).  It reimplements, from the
reference's *semantics* and with zero shared code with ``sid_lsg_tpu``:

- the diffusers ``DDPMScheduler`` surface the reference consumes
  (``/root/reference/training/sid_sd_util.py:65,242-274``): ``add_noise``,
  ``scale_model_input`` (identity for DDPM), ``step(...).pred_original_sample``,
  ``get_velocity``, and ``diffusers.training_utils.compute_snr``,
- the diffusers ``UNet2DConditionModel`` topology, built config-driven so its
  ``state_dict`` keys are EXACTLY the HF checkpoint keys (strict
  ``load_state_dict`` is itself a structural gate against the converter),
- ``sid_sd_sampler`` / ``sid_sd_denoise``
  (``/root/reference/training/sid_sd_util.py:163-274``) with text embeddings
  as inputs (the text tower is frozen and gated separately),
- both phase losses with NaN row-filtering and global-batch normalisation
  (``/root/reference/training/sid_training_loop.py:383-549``).

Known reference defect handled here: the reference's v-prediction SNR
weighting multiplies a (B,C,H,W) loss by a (B,) SNR vector
(``sid_training_loop.py:438-441`` with diffusers ``compute_snr`` returning
(B,)), which broadcasts incorrectly (crashes unless W == B) and uses the
UNfiltered timesteps after NaN rows were dropped.  The published configs never
exercise v-prediction (SD1.5/SD2.1-base are epsilon; the v-pred teacher load
path has its own NameError, SURVEY.md §2.5), so this module implements the
intended per-sample weighting ``snr_i/(snr_i+1)`` on the filtered rows —
matching ``sid_lsg_tpu.training.distill``'s documented interpretation.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn


# --------------------------------------------------------------------------
# Scheduler: diffusers DDPMScheduler semantics, written fresh.
# --------------------------------------------------------------------------
class TorchDDPM:
    """SD schedule: scaled_linear betas 0.00085..0.012, N=1000 (f32 linspace,
    exactly as diffusers constructs it)."""

    def __init__(self, prediction_type="epsilon", num_train_timesteps=1000,
                 beta_start=0.00085, beta_end=0.012):
        self.prediction_type = prediction_type
        betas = torch.linspace(beta_start**0.5, beta_end**0.5,
                               num_train_timesteps, dtype=torch.float32) ** 2
        alphas = 1.0 - betas
        self.alphas_cumprod = torch.cumprod(alphas, dim=0)

    def _coeffs(self, timesteps, ndim):
        ac = self.alphas_cumprod[timesteps].float()
        sqrt_ac = ac**0.5
        sqrt_omac = (1.0 - ac) ** 0.5
        shape = sqrt_ac.shape + (1,) * (ndim - sqrt_ac.ndim)
        return sqrt_ac.reshape(shape), sqrt_omac.reshape(shape)

    def add_noise(self, original_samples, noise, timesteps):
        sqrt_ac, sqrt_omac = self._coeffs(timesteps, original_samples.ndim)
        return sqrt_ac * original_samples + sqrt_omac * noise

    def scale_model_input(self, sample, timesteps):
        del timesteps  # DDPMScheduler.scale_model_input is the identity
        return sample

    def get_velocity(self, sample, noise, timesteps):
        sqrt_ac, sqrt_omac = self._coeffs(timesteps, sample.ndim)
        return sqrt_ac * noise - sqrt_omac * sample

    def step_pred_original_sample(self, model_output, timestep, sample):
        """``scheduler.step(...).pred_original_sample`` — the only field of
        ``step`` the reference ever reads (sid_sd_util.py:185,195,270)."""
        sqrt_ac, sqrt_omac = self._coeffs(timestep, sample.ndim)
        if self.prediction_type == "epsilon":
            return (sample - sqrt_omac * model_output) / sqrt_ac
        if self.prediction_type == "v_prediction":
            return sqrt_ac * sample - sqrt_omac * model_output
        if self.prediction_type == "sample":
            return model_output
        raise ValueError(self.prediction_type)

    def compute_snr(self, timesteps):
        ac = self.alphas_cumprod[timesteps].float()
        return ac / (1.0 - ac)


# --------------------------------------------------------------------------
# UNet2DConditionModel twin (diffusers topology, HF state-dict key naming).
# --------------------------------------------------------------------------
class _GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, 2 * inner)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class _FeedForward(nn.Module):
    def __init__(self, dim):
        super().__init__()
        inner = 4 * dim
        # ModuleList indices mirror diffusers FeedForward.net: 0=GEGLU,
        # 1=Dropout (parameter-free), 2=Linear — so keys are net.0.proj/net.2.
        self.net = nn.ModuleList([_GEGLU(dim, inner), nn.Dropout(0.0),
                                  nn.Linear(inner, dim)])

    def forward(self, x):
        for mod in self.net:
            x = mod(x)
        return x


class _Attention(nn.Module):
    """diffusers Attention: bias-free qkv, biased out proj (to_out.0)."""

    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, sq, inner = x.shape
        d = inner // self.heads
        sh = lambda t: t.view(b, -1, self.heads, d).transpose(1, 2)
        q, k, v = sh(self.to_q(x)), sh(self.to_k(ctx)), sh(self.to_v(ctx))
        probs = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d), dim=-1)
        out = (probs @ v).transpose(1, 2).reshape(b, sq, inner)
        return self.to_out[0](out)


class _BasicTransformerBlock(nn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = _Attention(dim, dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = _Attention(dim, ctx_dim, heads)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = _FeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff(self.norm3(x))
        return x


class _Transformer2D(nn.Module):
    def __init__(self, channels, ctx_dim, heads, groups, tf_layers):
        super().__init__()
        self.norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.proj_in = nn.Conv2d(channels, channels, 1)
        self.transformer_blocks = nn.ModuleList(
            [_BasicTransformerBlock(channels, ctx_dim, heads) for _ in range(tf_layers)]
        )
        self.proj_out = nn.Conv2d(channels, channels, 1)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        residual = x
        y = self.proj_in(self.norm(x))
        y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            y = blk(y, ctx)
        y = y.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(y) + residual


class _ResnetBlock(nn.Module):
    def __init__(self, cin, cout, temb_dim, groups, eps):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        r = x
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            r = self.conv_shortcut(r)
        return h + r


class _Downsample(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class _Upsample(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _TimeEmbedding(nn.Module):
    def __init__(self, cin, dim):
        super().__init__()
        self.linear_1 = nn.Linear(cin, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class _DownBlock(nn.Module):
    def __init__(self, cin, cout, temb_dim, layers, attn, heads, ctx_dim,
                 groups, eps, tf_layers, add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_ResnetBlock(cin if i == 0 else cout, cout, temb_dim, groups, eps)
             for i in range(layers)]
        )
        if attn:
            self.attentions = nn.ModuleList(
                [_Transformer2D(cout, ctx_dim, heads, groups, tf_layers)
                 for _ in range(layers)]
            )
        else:
            self.attentions = None
        if add_downsample:
            self.downsamplers = nn.ModuleList([_Downsample(cout)])
        else:
            self.downsamplers = None

    def forward(self, h, temb, ctx):
        states = []
        for i, res in enumerate(self.resnets):
            h = res(h, temb)
            if self.attentions is not None:
                h = self.attentions[i](h, ctx)
            states.append(h)
        if self.downsamplers is not None:
            h = self.downsamplers[0](h)
            states.append(h)
        return h, states


class _MidBlock(nn.Module):
    def __init__(self, channels, temb_dim, heads, ctx_dim, groups, eps, tf_layers):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_ResnetBlock(channels, channels, temb_dim, groups, eps),
             _ResnetBlock(channels, channels, temb_dim, groups, eps)]
        )
        self.attentions = nn.ModuleList(
            [_Transformer2D(channels, ctx_dim, heads, groups, tf_layers)]
        )

    def forward(self, h, temb, ctx):
        h = self.resnets[0](h, temb)
        h = self.attentions[0](h, ctx)
        h = self.resnets[1](h, temb)
        return h


class _UpBlock(nn.Module):
    def __init__(self, prev_channel, skip_channel, cout, temb_dim, layers, attn,
                 heads, ctx_dim, groups, eps, tf_layers, add_upsample):
        super().__init__()
        resnets = []
        for i in range(layers):
            res_skip = skip_channel if i == layers - 1 else cout
            res_in = prev_channel if i == 0 else cout
            resnets.append(
                _ResnetBlock(res_in + res_skip, cout, temb_dim, groups, eps)
            )
        self.resnets = nn.ModuleList(resnets)
        if attn:
            self.attentions = nn.ModuleList(
                [_Transformer2D(cout, ctx_dim, heads, groups, tf_layers)
                 for _ in range(layers)]
            )
        else:
            self.attentions = None
        if add_upsample:
            self.upsamplers = nn.ModuleList([_Upsample(cout)])
        else:
            self.upsamplers = None

    def forward(self, h, temb, ctx, skips):
        for i, res in enumerate(self.resnets):
            h = torch.cat([h, skips.pop()], dim=1)
            h = res(h, temb)
            if self.attentions is not None:
                h = self.attentions[i](h, ctx)
        if self.upsamplers is not None:
            h = self.upsamplers[0](h)
        return h


def timestep_embedding(t, dim):
    """diffusers get_timestep_embedding, flip_sin_to_cos=True, freq_shift=0."""
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TorchUNet2DCondition(nn.Module):
    """Config-driven UNet2DConditionModel twin; state_dict keys match the HF
    diffusers checkpoint layout exactly (strict load_state_dict)."""

    def __init__(self, cfg):
        super().__init__()
        assert not cfg.use_linear_projection, "conv-projection variant only"
        ch = cfg.block_out_channels
        temb_dim = ch[0] * 4
        groups, eps = cfg.norm_num_groups, cfg.norm_eps
        tf_layers = cfg.transformer_layers_per_block
        n = len(ch)
        self._ch0 = ch[0]
        self.conv_in = nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.time_embedding = _TimeEmbedding(ch[0], temb_dim)
        self.down_blocks = nn.ModuleList()
        cin = ch[0]
        for i in range(n):
            self.down_blocks.append(_DownBlock(
                cin, ch[i], temb_dim, cfg.layers_per_block,
                cfg.cross_attention_levels[i], cfg.num_attention_heads[i],
                cfg.cross_attention_dim, groups, eps, tf_layers,
                add_downsample=i < n - 1,
            ))
            cin = ch[i]
        self.mid_block = _MidBlock(ch[-1], temb_dim, cfg.num_attention_heads[-1],
                                   cfg.cross_attention_dim, groups, eps, tf_layers)
        rev = list(reversed(ch))
        rev_attn = list(reversed(cfg.cross_attention_levels))
        rev_heads = list(reversed(cfg.num_attention_heads))
        self.up_blocks = nn.ModuleList()
        prev = rev[0]
        for i in range(n):
            cout = rev[i]
            skip = rev[min(i + 1, n - 1)]
            self.up_blocks.append(_UpBlock(
                prev, skip, cout, temb_dim, cfg.layers_per_block + 1,
                rev_attn[i], rev_heads[i], cfg.cross_attention_dim,
                groups, eps, tf_layers, add_upsample=i < n - 1,
            ))
            prev = cout
        self.conv_norm_out = nn.GroupNorm(groups, ch[0], eps=eps)
        self.conv_out = nn.Conv2d(ch[0], cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, encoder_hidden_states):
        temb = self.time_embedding(timestep_embedding(timesteps, self._ch0))
        h = self.conv_in(sample)
        skips = [h]
        for block in self.down_blocks:
            h, states = block(h, temb, encoder_hidden_states)
            skips.extend(states)
        h = self.mid_block(h, temb, encoder_hidden_states)
        for block in self.up_blocks:
            h = block(h, temb, encoder_hidden_states, skips)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


def load_fixture_unet(fixture_dir, cfg):
    """Build the twin and strictly load the committed HF safetensors."""
    import os

    from safetensors.numpy import load_file

    sd = load_file(os.path.join(fixture_dir, "unet",
                                "diffusion_pytorch_model.safetensors"))
    unet = TorchUNet2DCondition(cfg)
    unet.load_state_dict(
        {k: torch.as_tensor(np.asarray(v, np.float32)) for k, v in sd.items()},
        strict=True,
    )
    return unet.eval()


# --------------------------------------------------------------------------
# SiD-LSG math (sid_sd_util.py:163-274 with embeddings as inputs).
# --------------------------------------------------------------------------
def sid_sampler_torch(unet, sched, latents, emb, init_timesteps, num_steps=1,
                      extra_noises=None):
    """Reference sid_sd_sampler train/eval math (identical in fp32).

    ``extra_noises``: list of tensors used as the fresh noise for steps i>=1
    (the reference draws torch.randn; the gate injects jax-derived noise so
    both sides consume identical randomness)."""
    d_x = torch.zeros_like(latents)
    for i in range(num_steps):
        noise = latents if i == 0 else extra_noises[i - 1]
        t_i = (init_timesteps.float() * (1.0 - i / num_steps)).long()
        noisy = sched.add_noise(d_x, noise, t_i).float()
        model_in = sched.scale_model_input(noisy, t_i)
        noise_pred = unet(model_in, t_i, encoder_hidden_states=emb).float()
        # Reference uses the scalar init_timesteps_i[0] (uniform batch).
        d_x = sched.step_pred_original_sample(noise_pred, t_i[0], noisy).float()
    return d_x


def sid_denoise_torch(unet, sched, images, noise, emb, uncond_emb, timesteps,
                      guidance_scale=1.0, predict_x0=True):
    """Reference sid_sd_denoise: add_noise -> UNet (batch-doubled CFG) ->
    kappa mixing -> per-sample step loop for x0 (sid_sd_util.py:242-274)."""
    latents = sched.add_noise(images, noise, timesteps)
    if guidance_scale == 1.0:
        model_in = sched.scale_model_input(latents, timesteps)
        noise_pred = unet(model_in, timesteps, encoder_hidden_states=emb).float()
    else:
        emb2 = torch.cat([uncond_emb, emb])
        t2 = torch.cat([timesteps, timesteps])
        lat2 = torch.cat([latents] * 2)
        model_in = sched.scale_model_input(lat2, t2)
        out2 = unet(model_in, t2, encoder_hidden_states=emb2).float()
        out_uncond, out_text = out2.chunk(2)
        noise_pred = out_uncond + guidance_scale * (out_text - out_uncond)
    if predict_x0:
        latents = latents.float()
        d_x = [sched.step_pred_original_sample(n[None], t, z[None])[0]
               for n, t, z in zip(noise_pred, timesteps, latents)]
        return torch.stack(d_x).float()
    return noise_pred.float()


def psi_loss_torch(fake_unet, sched, images, noise, emb, uncond_emb, t,
                   kappa1, loss_scaling, denom):
    """Fake-score phase loss for one accumulation round
    (sid_training_loop.py:417-447)."""
    noise_fake = sid_denoise_torch(fake_unet, sched, images, noise, emb,
                                   uncond_emb, t, guidance_scale=kappa1,
                                   predict_x0=False)
    nan_mask = torch.isnan(noise_fake).flatten(start_dim=1).any(dim=1)
    v_pred = sched.prediction_type == "v_prediction"
    target = None
    if v_pred:
        target = sched.get_velocity(images, noise, t)
        nan_mask = nan_mask | torch.isnan(target).flatten(start_dim=1).any(dim=1)
    t_kept = t
    if nan_mask.any():
        keep = ~nan_mask
        noise_fake = noise_fake[keep]
        noise = noise[keep]
        t_kept = t[keep]
        if v_pred:
            target = target[keep]
    if v_pred:
        loss = (noise_fake - target) ** 2
        snr = sched.compute_snr(t_kept)
        # Intended per-sample weighting; see module docstring for the
        # reference's broadcasting defect here.
        loss = loss * (snr / (snr + 1)).view(-1, 1, 1, 1)
    else:
        loss = (noise_fake - noise) ** 2
    return loss.sum() * (loss_scaling / denom)


def g_loss_torch(g_unet, fake_unet, true_unet, sched, z, noise, emb,
                 uncond_emb, t, init_t, kappa23, kappa4, alpha,
                 loss_scaling_G, denom, num_steps=1, extra_noises=None):
    """Generator phase loss for one accumulation round
    (sid_training_loop.py:487-533): sampler fwd (grad tracked) ->
    fake/teacher kappa-guided denoise pair -> SiD alpha-loss."""
    images = sid_sampler_torch(g_unet, sched, z, emb, init_t,
                               num_steps=num_steps, extra_noises=extra_noises)
    y_fake = sid_denoise_torch(fake_unet, sched, images, noise, emb,
                               uncond_emb, t, guidance_scale=kappa23,
                               predict_x0=True)
    y_real = sid_denoise_torch(true_unet, sched, images, noise, emb,
                               uncond_emb, t, guidance_scale=kappa4,
                               predict_x0=True)
    nan_mask = (torch.isnan(images).flatten(start_dim=1).any(dim=1)
                | torch.isnan(y_real).flatten(start_dim=1).any(dim=1)
                | torch.isnan(y_fake).flatten(start_dim=1).any(dim=1))
    if nan_mask.any():
        keep = ~nan_mask
        images, y_real, y_fake = images[keep], y_real[keep], y_fake[keep]
    with torch.no_grad():
        weight_factor = abs(images.float() - y_real.float()).mean(
            dim=[1, 2, 3], keepdim=True).clip(min=0.00001)
    if alpha == 1:
        loss = (y_real - y_fake) * (y_fake - images) / weight_factor
    else:
        loss = (y_real - y_fake) * ((y_real - images)
                                    - alpha * (y_real - y_fake)) / weight_factor
    return loss.sum() * (loss_scaling_G / denom)

# --------------------------------------------------------------------------
# SiDA adversarial terms (beyond-reference: the reference ANNOUNCES this
# integration, README.md:12, but ships no implementation — these reimplement
# sid_lsg_tpu/training/adversarial.py's documented SPEC independently so the
# composed gate extends to the adversarial step).
# --------------------------------------------------------------------------
def encoder_features_torch(unet, x, t, emb):
    """Encoder-only twin forward: conv_in + down path + mid block ->
    bottleneck feature map (models/unet.py ``encoder_only=True`` semantics:
    stop after the mid block, no up path)."""
    temb = unet.time_embedding(timestep_embedding(t, unet._ch0))
    h = unet.conv_in(x)
    for block in unet.down_blocks:
        h, _states = block(h, temb, emb)
    return unet.mid_block(h, temb, emb)


def encoder_pooled_logit_torch(unet, sched, latents, noise, emb, t):
    """The SiDA discriminator readout: noise the latents with the SAME
    schedule/timesteps the denoising losses use (Diffusion-GAN), run the
    fake-score net's encoder, global-mean-pool to one f32 logit per image."""
    x_t = sched.add_noise(latents, noise, t)
    x_in = sched.scale_model_input(x_t, t)
    feats = encoder_features_torch(unet, x_in, t, emb)
    return feats.float().mean(dim=[1, 2, 3])


def adv_d_loss_torch(fake_unet, sched, images, noise, emb, t,
                     lat_real, noise_real, emb_real,
                     adv_weight_D, loss_scaling, denom, kind="ns",
                     t_real=None):
    """Discriminator-phase adversarial term (added to the psi loss): push
    real logits up and generated logits down, each side row-filtered by its
    OWN validity (a corrupt real row drops only its own softplus term).
    Inputs here are the already-valid rows; the caller filters — including
    ``t_real`` (per-row timesteps travel with their real row when rows are
    dropped; defaults to ``t`` for the full-batch case)."""
    if t_real is None:
        t_real = t
    lf = encoder_pooled_logit_torch(fake_unet, sched, images, noise, emb, t)
    lr = encoder_pooled_logit_torch(fake_unet, sched, lat_real, noise_real,
                                    emb_real, t_real)
    if kind == "ns":
        d = F.softplus(lf).sum() + F.softplus(-lr).sum()
    elif kind == "hinge":
        d = torch.clamp(1.0 + lf, min=0).sum() + torch.clamp(1.0 - lr, min=0).sum()
    else:
        raise ValueError(kind)
    return d * (adv_weight_D * loss_scaling / denom)


def adv_g_loss_torch(g_unet, fake_unet, sched, z, noise, emb, t, init_t,
                     adv_weight_G, loss_scaling_G, denom, kind="ns"):
    """Generator-phase adversarial term (added to the SiD loss): gradient
    reaches theta through the sampled images; the discriminator (psi's
    encoder) is a fixed judge here."""
    images = sid_sampler_torch(g_unet, sched, z, emb, init_t)
    lf = encoder_pooled_logit_torch(fake_unet, sched, images, noise, emb, t)
    if kind == "ns":
        g = F.softplus(-lf).sum()
    elif kind == "hinge":
        g = (-lf).sum()
    else:
        raise ValueError(kind)
    return g * (adv_weight_G * loss_scaling_G / denom)
