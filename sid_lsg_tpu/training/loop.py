"""Training orchestration: run dir, ticks, snapshots, stats, resume.

The counterpart of reference ``training/sid_training_loop.py:148-747`` minus
everything that moved into the jitted step (``distill.py``).  What remains is
genuinely host-side: run-dir bookkeeping and ``training_options.json``
(``sid_train.py:362-368``), the prompt stream, text encoding (frozen tower,
once per batch), tick-cadenced console/stats-jsonl reporting
(``sid_training_loop.py:570-662``), fixed-seed sample grids
(``temporary_seed = 2024``, ``:259-271,597-616``), snapshot/state saves, and
resume.

Differences by design:
- one process drives all local chips; `batch_gpu` becomes `microbatch` (the
  per-accumulation-round *global* batch) and accumulation rounds =
  batch_size // microbatch,
- checkpoints are orbax (sharded, atomic) + safetensors EMA snapshots instead
  of torch pickles,
- the tick loss is the mean over accumulation rounds, not the last round's
  value (reference defect, SURVEY.md §2.5).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.prompts import InfinitePromptIterator, PromptDataset
from ..diffusion.rng import seeded_latents
from ..parallel import make_mesh, runtime, shard_params
from ..pipeline import SDPipeline
from ..utils import training_stats
from ..utils.util import EasyDict, format_time
from .distill import DistillConfig, make_train_step
from .state import SiDState, init_state, make_optimizer

# Early ticks that get sample grids regardless of the uniform cadence
# (reference sid_training_loop.py:597).
EARLY_SAMPLE_TICKS = (2, 4, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100)


@dataclasses.dataclass
class TrainConfig:
    """Flag surface of reference ``sid_train.py:88-158`` in one dataclass."""

    run_dir: str = "."
    data: str = ""  # prompt corpus path (file or dir)
    model: str = "sd15"  # preset or HF-layout checkpoint dir
    prediction_type: Optional[str] = None
    resolution: int = 512
    # Optimization (defaults = paper config, BASELINE.md).
    batch_size: int = 512
    microbatch: int = 8  # global batch per accumulation round
    glr: float = 1e-6
    lr: float = 1e-6
    adam_eps: float = 1e-8
    optimizer: str = "adam"  # 'adam' | 'adamw' (reference sid_train.py:155)
    weight_decay: float = 0.01  # applied only when optimizer == 'adamw'
    # LSG guidance scales.
    cfg_train_fake: float = 1.0
    cfg_eval_fake: float = 1.0
    cfg_eval_real: float = 1.0
    # Distillation.
    init_timestep: int = 625
    tmin: int = 20
    tmax: int = 980
    alpha: float = 1.0
    loss_scaling: float = 1.0
    loss_scaling_G: float = 1.0
    num_steps: int = 1
    ema_halflife_kimg: float = 500.0
    ema_rampup_ratio: Optional[float] = 0.05
    # Schedule.
    total_kimg: int = 200000
    kimg_per_tick: int = 50
    snapshot_ticks: int = 50
    state_dump_ticks: int = 500
    sample_ticks: int = 50
    seed: int = 0
    # SiDA-style adversarial terms (the reference's announced roadmap,
    # README.md:12; see training/adversarial.py).  ``adv_data`` is an
    # encode_latents npz of real latents+captions; when unset but weights are
    # >0, a synthetic random-latent stream keeps smoke tests/offline runs
    # working (useless for quality — a warning is printed).
    adv_weight_D: float = 0.0
    adv_weight_G: float = 0.0
    gan_loss: str = "ns"
    adv_data: Optional[str] = None
    # Discriminator tower: 'encoder' (psi's encoder on noised latents — the
    # announced zero-parameter design) or 'dino' (the projected StyleGAN-T
    # discriminator on VAE-decoded pixels: frozen DINO ViT features +
    # trainable spectral heads, reference networks/discriminator.py — shipped
    # there but never wired into a loop).  'dino' decodes every adversarial
    # microbatch through the VAE inside the train step.
    adv_tower: str = "encoder"
    adv_dino: Optional[str] = None  # timm/dino ViT-S/16 state dict (torch pickle)
    adv_vit: str = "s16"  # 's16' | 'tiny' (tiny = tests/smoke only)
    # Precision / memory.
    use_bf16: bool = True
    gradient_checkpointing: bool = False
    remat_policy: str = "full"  # models/unet.py remat_policy (full/dots/attn/...)
    # Low-memory Adam state for theta (no first moment at b1=0, bf16 second
    # moment) — the single-chip full-width escape hatch (BENCH_NOTES.md).
    low_mem_opt: bool = False
    # Store the frozen teacher in bf16.  The UNet casts params to the compute
    # dtype at apply time anyway, so with bf16 compute this only moves that
    # rounding to load time — and frees a full f32-minus-bf16 param set of
    # HBM (1.7 GB at SD1.5 width; what unlocks microbatch 4 on one v5e).
    teacher_bf16: bool = False
    # LoRA fake score (reference --fake_score_use_lora, sid_train.py:157).
    fake_score_use_lora: bool = False
    lora_rank: int = 4
    # Parallelism.
    fsdp: int = 1
    # Metrics during training (reference sid_training_loop.py:619-638).
    metrics: Optional[List[str]] = None
    metric_data: Optional[str] = None  # prepared COCO eval folder
    metric_ticks: int = 50
    metric_num_gen: int = 30000
    # Profiling: capture a jax profiler trace of steps [start, start+count).
    profile_dir: Optional[str] = None
    profile_start_step: int = 2  # skip compile + warmup
    profile_steps: int = 3
    # Resume.
    resume: Optional[str] = None
    resume_kimg: int = 0
    max_ticks: Optional[int] = None  # early stop for tests/smoke

    def as_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


def save_image_grid(images: np.ndarray, path: str, grid_wh=None) -> None:
    """uint8 (N,H,W,3) -> one PNG grid (reference save_image_grid:99 role)."""
    from PIL import Image

    n, h, w, _ = images.shape
    gw = grid_wh[0] if grid_wh else int(np.ceil(np.sqrt(n)))
    gh = grid_wh[1] if grid_wh else int(np.ceil(n / gw))
    canvas = np.zeros((gh * h, gw * w, 3), np.uint8)
    for i in range(n):
        r, c = divmod(i, gw)
        canvas[r * h : (r + 1) * h, c * w : (c + 1) * w] = images[i]
    Image.fromarray(canvas, "RGB").save(path)


class Trainer:
    """Owns pipeline, state, jitted step and the tick loop."""

    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        runtime.init_distributed()
        dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
        self.pipe = SDPipeline.from_pretrained(
            cfg.model, dtype=dtype, prediction_type=cfg.prediction_type
        )
        self.mesh = make_mesh(fsdp=cfg.fsdp)
        sd_cfg = self.pipe.config
        if cfg.remat_policy != "full" and not cfg.gradient_checkpointing:
            raise ValueError(
                f"remat_policy={cfg.remat_policy!r} has no effect without "
                "gradient_checkpointing — pass --grad-ckpt 1"
            )

        assert cfg.batch_size % cfg.microbatch == 0, "batch_size % microbatch != 0"
        if self.mesh.size > 1 and cfg.microbatch % self.mesh.size != 0:
            # The shard_map flash-attention routing (and even batch sharding)
            # needs the microbatch to split evenly across devices; catching it
            # here beats a cryptic Mosaic partition error at compile time.
            raise ValueError(
                f"microbatch={cfg.microbatch} not divisible by mesh size "
                f"{self.mesh.size} (dp x fsdp) — pick a multiple"
            )
        self.a_rounds = cfg.batch_size // cfg.microbatch
        # Per-process data slab: multi-host loading is process-strided
        # (disjoint streams per host, reference InfiniteSampler semantics), so
        # each host produces microbatch/process_count rows per round;
        # shard_round_batch assembles them into the global batch.  Equals
        # cfg.microbatch in the common single-process case.
        from ..parallel import process_local_rows

        self.mb_local = process_local_rows(cfg.microbatch)
        self.dcfg = DistillConfig(
            latent_size=sd_cfg.unet.sample_size,
            latent_channels=sd_cfg.unet.in_channels,
            init_timestep=cfg.init_timestep,
            tmin=cfg.tmin,
            tmax=cfg.tmax,
            cfg_train_fake=cfg.cfg_train_fake,
            cfg_eval_fake=cfg.cfg_eval_fake,
            cfg_eval_real=cfg.cfg_eval_real,
            alpha=cfg.alpha,
            loss_scaling=cfg.loss_scaling,
            loss_scaling_G=cfg.loss_scaling_G,
            num_steps=cfg.num_steps,
            batch_size=cfg.batch_size,
            ema_halflife_kimg=cfg.ema_halflife_kimg,
            ema_rampup_ratio=cfg.ema_rampup_ratio,
            dtype=dtype,
            adv_weight_D=cfg.adv_weight_D,
            adv_weight_G=cfg.adv_weight_G,
            gan_loss=cfg.gan_loss,
            adv_tower=cfg.adv_tower,
        )
        unet = self.pipe.unet
        if cfg.gradient_checkpointing:
            from ..models.unet import UNet2DCondition

            unet = UNet2DCondition(sd_cfg.unet, dtype=dtype, remat=True,
                                   remat_policy=cfg.remat_policy)
        unet_apply = lambda p, x, t, c: unet.apply({"params": p}, x, t, c)
        unet_encode = (
            (lambda p, x, t, c: unet.apply({"params": p}, x, t, c, encoder_only=True))
            if self.dcfg.adversarial and cfg.adv_tower == "encoder" else None
        )

        # Pixel-space projected discriminator (--adv_tower dino): frozen DINO
        # backbone + VAE decoder ride as a replicated 'disc_frozen' batch
        # entry; the trainable spectral heads join params_fake ({'psi','disc'})
        # so the psi optimizer updates them in the psi phase.
        self._pixel_disc = None
        self._disc_frozen = None
        self._refresh_spectral = None
        disc_head_init = None
        if self.dcfg.adversarial and cfg.adv_tower == "dino":
            from ..models.stylegan_discriminator import (
                DINO_VIT_S16, TINY_VIT, ProjectedDiscriminator, convert_dino,
            )

            vit_cfg = TINY_VIT if cfg.adv_vit == "tiny" else DINO_VIT_S16
            text_dim = sd_cfg.unet.cross_attention_dim
            # power_iters=3 sweeps inside the jitted step, from the PERSISTENT
            # u the Trainer refreshes against the updated kernels after every
            # step (refresh_spectral_u — torch spectral_norm's persistent-u
            # semantics; from a fixed init-u the sigma estimate decays 6-11%
            # as kernels drift, measured in tests/test_stylegan_t.py).
            disc = ProjectedDiscriminator(c_dim=text_dim, vit=vit_cfg,
                                          power_iters=3)
            res = sd_cfg.resolution  # pixel size the VAE decodes to
            dvars = disc.init(
                jax.random.PRNGKey(cfg.seed + 3),
                jnp.zeros((1, 3, res, res), jnp.float32),
                jnp.zeros((1, text_dim), jnp.float32),
            )
            dparams = dict(dvars["params"])
            dino_params = dparams.pop("dino")
            if cfg.adv_dino:
                from ..runtime.checkpoint import torch_pickle_state_dict

                dino_params = convert_dino(
                    torch_pickle_state_dict(cfg.adv_dino), vit_cfg
                )
            else:
                runtime.print0(
                    "WARNING: --adv_tower dino without --adv_dino uses a "
                    "RANDOM DINO backbone — smoke/testing only."
                )
            if self.dcfg.adv_weight_D == 0.0:
                runtime.print0(
                    "WARNING: --adv_tower dino with adv_weight_d == 0 — the "
                    "spectral heads receive no gradients (only the D loss "
                    "trains them), so the G term judges with random heads."
                )
            disc_head_init = dparams  # {'head_0': ..., ...} spectral heads
            from .adversarial import make_pixel_disc

            self._pixel_disc, decode_params = make_pixel_disc(
                self.pipe.vae, disc, sd_cfg.vae.scaling_factor
            )
            from ..parallel.mesh import replicated_sharding
            from .. import parallel as _par

            rep = replicated_sharding(self.mesh)
            self._disc_frozen = jax.tree_util.tree_map(
                lambda x: _par.global_put(np.asarray(x), rep),
                {"vae": decode_params(self.pipe.params["vae"]),
                 "dino": dino_params,
                 "spectral": dict(dvars["spectral"])},
            )
            from ..models.stylegan_discriminator import refresh_spectral_u

            # Persistent-u: advance each head's power-iteration vector against
            # the kernels the psi phase just updated; feeds the NEXT step's
            # disc_frozen.  Replicated in/out (tiny matvecs), jitted once.
            self._refresh_spectral = jax.jit(
                refresh_spectral_u,
                out_shardings=jax.tree_util.tree_map(
                    lambda _: rep, dict(dvars["spectral"])),
            )
        wd = cfg.weight_decay if cfg.optimizer == "adamw" else 0.0
        self.opt_g = make_optimizer(lr=cfg.glr, eps=cfg.adam_eps,
                                    low_mem_state=cfg.low_mem_opt,
                                    weight_decay=wd)
        self.opt_fake = make_optimizer(
            lr=cfg.lr, eps=cfg.adam_eps,
            low_mem_state=cfg.low_mem_opt and not cfg.fake_score_use_lora,
            weight_decay=wd,
        )
        fake_transform = None
        params_fake_init = None
        if cfg.fake_score_use_lora:
            from .lora import apply_lora, init_lora

            params_fake_init = init_lora(
                jax.random.PRNGKey(cfg.seed + 1), self.pipe.params["unet"],
                rank=cfg.lora_rank,
            )
            fake_transform = lambda pf, teacher: apply_lora(teacher, pf)
        if disc_head_init is not None:
            # Pixel-tower mode: state.params_fake = {'psi': ..., 'disc': ...}
            # (distill.py psi_of/disc_of split; fake_transform sees only psi).
            params_fake_init = {
                "psi": (params_fake_init if params_fake_init is not None
                        else self.pipe.params["unet"]),
                "disc": disc_head_init,
            }
        # Teacher stays a separate frozen pytree; state holds the 3 trainables.
        # State init must see the f32 weights (theta/EMA are f32 masters);
        # the teacher cast happens after.
        unet_f32 = self.pipe.params["unet"]
        state = init_state(unet_f32, self.opt_g, self.opt_fake,
                           resume_nimg=cfg.resume_kimg * 1000,
                           params_fake=params_fake_init)
        self.state = self._shard_state(state)
        teacher = unet_f32
        if cfg.teacher_bf16:
            if not cfg.use_bf16:
                runtime.print0(
                    "WARNING: --teacher-bf16 with f32 compute (--bf16 0) "
                    "quantizes the frozen teacher and DOES change numerics; "
                    "it is numerically free only under bf16 compute."
                )
            teacher = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16), unet_f32
            )
            # Drop the f32 original (sampling goes through params['generator'],
            # which the loop points at the EMA): keeping both copies alive
            # costs a full param set of HBM.
            self.pipe.params = dict(self.pipe.params, unet=teacher)
        self.teacher = shard_params(teacher, self.mesh)

        multi = self.mesh.size > 1
        from .distill import jit_train_step

        step_fn = make_train_step(unet_apply, self.pipe.scheduler, self.dcfg,
                                  self.opt_g, self.opt_fake,
                                  fake_transform=fake_transform,
                                  unet_encode=unet_encode,
                                  mesh=self.mesh if multi else None,
                                  pixel_disc=self._pixel_disc)
        batch_example = dict.fromkeys(
            ("emb_fake", "emb_g", "uncond_emb")
            + (("lat_real", "emb_real") if self.dcfg.adv_weight_D > 0.0 else ())
            + (("disc_frozen",) if self._pixel_disc is not None else ())
        )
        jitted_step = jit_train_step(
            step_fn,
            mesh=self.mesh if multi else None,
            state=self.state, teacher=self.teacher, batch=batch_example,
        )
        if multi:
            # Mosaic kernels inside multi-device jits must run in shard_map
            # manual regions (GSPMD cannot auto-partition them).  The mesh
            # registration matters only while the step TRACES, so scope it to
            # the call — later unrelated jits (sampling, metrics) trace with
            # a clean global.
            from ..ops.attention import shard_mesh_scope

            self._compiled_step = None

            def train_step(*args):
                with shard_mesh_scope(self.mesh):
                    if runtime.get_process_count() == 1:
                        return jitted_step(*args)
                    # Multi-process: a plain jit call compiles (minutes)
                    # and then DISPATCHES immediately — the first process
                    # out of compile starts Gloo's HARDCODED 30s
                    # context-creation clock while the others still
                    # compile, killing the run
                    # (tests/test_multiprocess.py).  AOT-compile, then
                    # align every process on the coordination-service
                    # barrier (long timeout) before the first dispatch.
                    if self._compiled_step is None:
                        self._compiled_step = jitted_step.lower(
                            *args).compile()
                        runtime.sync_hosts("train-step-compiled")
                    return self._compiled_step(*args)

            self.train_step = train_step
        else:
            self.train_step = jitted_step

        # Prompt stream: one fresh microbatch per accumulation round per phase.
        if cfg.data:
            dataset = PromptDataset(cfg.data)
        else:  # offline smoke: synthetic prompts
            dataset = PromptDataset([f"prompt {i}" for i in range(1024)], name="synthetic")
        self.prompts = InfinitePromptIterator(
            dataset, self.mb_local, seed=cfg.seed,
            process_index=runtime.get_process_index(),
            process_count=runtime.get_process_count(),
        )

        # Real-latent stream for the SiDA discriminator.  Only the D loss
        # consumes real latents; a G-only adversarial run must not pay for
        # (or warn about) a corpus it never reads.
        self.latents = None
        if cfg.adv_data and self.dcfg.adv_weight_D == 0.0:
            runtime.print0(
                "WARNING: --adv_data is set but adv_weight_d == 0 — the "
                "real-latent corpus will NOT be read (only the discriminator "
                "loss consumes real latents)."
            )
        if self.dcfg.adv_weight_D > 0.0:
            if cfg.adv_data:
                from ..data.latents import InfiniteLatentIterator, LatentDataset

                lat_ds = LatentDataset(cfg.adv_data)
                h = lat_ds.latents.shape[1]
                if h != self.dcfg.latent_size:
                    raise ValueError(
                        f"{cfg.adv_data}: latent resolution {h} != model "
                        f"latent size {self.dcfg.latent_size}"
                    )
                self.latents = InfiniteLatentIterator(
                    lat_ds, self.mb_local, seed=cfg.seed + 2,
                    process_index=runtime.get_process_index(),
                    process_count=runtime.get_process_count(),
                )
            else:
                runtime.print0(
                    "WARNING: adversarial training without --adv_data uses "
                    "SYNTHETIC random latents — smoke/testing only."
                )
                # Per-process seed: hosts must feed DISTINCT slabs (the real
                # iterators stride; identical RandomState would assemble N
                # copies of each 'real' row into the global batch).
                self._adv_rng = np.random.RandomState(
                    cfg.seed + 2 + 1000 * runtime.get_process_index()
                )
        self.ckpt_mgr = None
        self._eval_jits: dict = {}  # multi-process eval programs (see _eval_images)
        self._vae_global = None

    def _shard_state(self, state: SiDState) -> SiDState:
        """Place EVERY leaf — including 0-d scalars (step/nimg/optimizer
        counts) — onto the mesh with the production shardings.  Leaving
        scalars as plain ``jnp`` values looks harmless (they are uncommitted,
        so the compiled step silently reshards them), but it poisons the
        RESUME path: the restore template is this state, orbax restores
        committed ``SingleDeviceSharding`` scalars matching it, and a
        multi-process compiled step then rejects them at the input-sharding
        check (found by test_multiprocess.py::test_two_process_fsdp_training's
        resume leg)."""
        place = lambda tree: shard_params(tree, self.mesh)
        return SiDState(
            step=place(state.step),
            nimg=place(state.nimg),
            params_G=place(state.params_G),
            params_fake=place(state.params_fake),
            ema=place(state.ema),
            opt_G=place(state.opt_G),
            opt_fake=place(state.opt_fake),
        )

    # ------------------------------------------------------------------ io
    def _encode_rounds(self) -> jnp.ndarray:
        """(A, mb_local, L, D) embeddings for one phase: A fresh prompt
        microbatches of this process's slab (== the global microbatch
        single-process)."""
        prompts: List[str] = []
        for _ in range(self.a_rounds):
            prompts.extend(next(self.prompts))
        emb = self.pipe.encode_prompts(prompts)
        return emb.reshape(self.a_rounds, self.mb_local, *emb.shape[1:])

    def _adv_rounds(self):
        """(A, mb_local, h, w, c) real latents + (A, mb_local, L, D) caption
        embeddings (per-process slabs, like ``_encode_rounds``)."""
        mb, A = self.mb_local, self.a_rounds
        if self.latents is not None:
            lats, caps = [], []
            for _ in range(A):
                lat, cap = next(self.latents)
                lats.append(lat)
                caps.extend(cap)
            lat = np.stack(lats)
        else:  # synthetic smoke stream (warned at init)
            s, c = self.dcfg.latent_size, self.dcfg.latent_channels
            lat = self._adv_rng.randn(A, mb, s, s, c).astype(np.float32)
            caps = [p for _ in range(A) for p in next(self.prompts)]
        emb = self.pipe.encode_prompts(caps)
        return jnp.asarray(lat), emb.reshape(A, mb, *emb.shape[1:])

    def next_batch(self) -> Dict[str, jnp.ndarray]:
        batch = {
            "emb_fake": self._encode_rounds(),
            "emb_g": self._encode_rounds(),
            "uncond_emb": self.pipe.uncond_embedding(),
        }
        if self.dcfg.adv_weight_D > 0.0:
            batch["lat_real"], batch["emb_real"] = self._adv_rounds()
        if self.mesh.size > 1:
            # Explicit placement (microbatch axis over dp x fsdp) — GSPMD
            # never infers batch shardings from use sites (VERDICT r2 #1).
            from ..parallel import shard_round_batch

            batch = shard_round_batch(batch, self.mesh)
        if self._disc_frozen is not None:
            # Already device-placed (replicated) once at init; inserting the
            # placed arrays directly makes the per-step put a no-op.
            batch["disc_frozen"] = self._disc_frozen
        return batch

    def save_snapshot(self, kimg: int) -> str:
        from ..runtime.checkpoint import export_generator

        tag = f"{self.cfg.alpha:g}".replace(".", "_")
        path = os.path.join(
            self.cfg.run_dir, f"network-snapshot-{tag}-{kimg:06d}.safetensors"
        )
        export_generator(self.state.ema, path)
        return path

    def _ckpt_tree(self):
        """Checkpoint payload: the SiDState, plus — when the pixel tower is
        active — the persistent spectral-norm ``u`` vectors.  torch
        ``spectral_norm`` keeps ``u`` in the state_dict the reference
        snapshots; without it a resume re-estimates sigma from the init-u
        against drifted kernels (6-11% under-estimate, measured in
        tests/test_stylegan_t.py).  Non-adversarial runs keep the plain
        SiDState layout."""
        if self._disc_frozen is None:
            return self.state
        return {"state": self.state, "spectral": self._disc_frozen["spectral"]}

    def _accept_ckpt(self, restored) -> None:
        if isinstance(restored, dict) and "state" in restored:
            self.state = restored["state"]
            if self._disc_frozen is not None:
                self._disc_frozen = dict(self._disc_frozen,
                                         spectral=restored["spectral"])
        else:
            self.state = restored

    def restore_from(self, mgr, step=None) -> None:
        """Restore through ``mgr`` with the current layout, falling back to
        the plain pre-spectral layout for older checkpoints.  Only tree
        structure/key mismatches trigger the fallback (corruption, sharding
        or IO failures propagate), and falling back is loudly logged: it
        leaves spectral-u at init, re-entering the 6-11% sigma-under-estimate
        regime documented in ``_ckpt_tree``."""
        try:
            restored = mgr.restore(step, template=self._ckpt_tree())
        except (ValueError, KeyError, TypeError):
            if self._disc_frozen is None:
                raise
            restored = mgr.restore(step, template=self.state)
            runtime.print0(
                "WARNING: checkpoint restored with the pre-spectral layout; "
                "spectral-norm u vectors reset to init (sigma will be "
                "under-estimated until power iteration re-converges)."
            )
        self._accept_ckpt(restored)

    def save_state(self, step: int) -> None:
        from ..runtime.checkpoint import CheckpointManager

        if self.ckpt_mgr is None:
            self.ckpt_mgr = CheckpointManager(
                os.path.join(self.cfg.run_dir, "checkpoints")
            )
        self.ckpt_mgr.save(step, self._ckpt_tree())
        self.ckpt_mgr.wait()  # orbax saves async; finish before continuing

    def restore_state(self) -> bool:
        from ..runtime.checkpoint import CheckpointManager

        ckdir = os.path.join(self.cfg.run_dir, "checkpoints")
        if not os.path.isdir(ckdir):
            return False
        mgr = CheckpointManager(ckdir)
        step = mgr.latest_step()
        if step is None:
            return False
        self.restore_from(mgr, step)
        return True

    def eval_metrics(self, snapshot_path: Optional[str]) -> None:
        """Run configured metrics on the current EMA generator
        (reference metric hook, sid_training_loop.py:619-638)."""
        if not self.cfg.metrics:
            return
        from ..metrics import MetricOptions, calc_metric, report_metric

        self.pipe.params = dict(self.pipe.params)
        if runtime.get_process_count() == 1:
            self.pipe.params["generator"] = self.state.ema
        else:
            # The pipeline's metric jits run per-host on local devices; give
            # them a host copy of the (globally sharded) EMA.  Collective —
            # every process calls eval_metrics (metric loops are
            # process-strided by design).
            from ..runtime.checkpoint import fetch_tree_to_host

            self.pipe.params["generator"] = fetch_tree_to_host(self.state.ema)
        opts = MetricOptions(
            pipe=self.pipe,
            dataset_path=self.cfg.metric_data,
            num_gen=self.cfg.metric_num_gen,
            init_timestep=self.cfg.init_timestep,
        )
        for metric in self.cfg.metrics:
            result = calc_metric(metric, opts=opts)
            if runtime.get_process_index() == 0:
                report_metric(result, run_dir=self.cfg.run_dir or None,
                              snapshot_pkl=snapshot_path)

    def _eval_images(self, prompts, lat, num_steps_eval: int) -> np.ndarray:
        """EMA generator samples -> uint8 images, on any process topology.

        Single-process (incl. a local fsdp mesh): the pipeline's jits on the
        addressable devices.  Multi-process: ONE global SPMD program over the
        mesh — the AOT-proven eval graph (sampler + VAE decode on the
        training-layout, possibly fsdp-sharded, EMA params; see
        scripts/aot_compile_multichip.py --eval) — so this method is
        COLLECTIVE: every process must call it with identical inputs (true by
        construction: grid prompts/latents are seed-derived).  Output is
        replicated, so every host can read it locally."""
        if runtime.get_process_count() == 1:
            return np.asarray(self.pipe.generate(
                prompts, lat, num_steps=num_steps_eval,
                init_timestep=self.cfg.init_timestep,
                rng=jax.random.PRNGKey(2024),
            ))
        from ..parallel.mesh import (
            batch_sharding, global_put, param_shardings, replicated_sharding,
        )

        n = int(np.shape(lat)[0])
        pad = (-n) % self.mesh.size
        if pad:  # batch axis must split evenly over the mesh
            lat = np.concatenate(
                [np.asarray(lat), np.zeros((pad, *np.shape(lat)[1:]), np.asarray(lat).dtype)]
            )
            prompts = list(prompts) + [""] * pad
        emb = np.asarray(self.pipe.encode_prompts(prompts))
        z = global_put(np.asarray(lat), batch_sharding(self.mesh, np.ndim(lat)))
        emb_g = global_put(emb, batch_sharding(self.mesh, emb.ndim))
        key = ("mp_eval", num_steps_eval, z.shape, emb_g.shape)
        if key not in self._eval_jits:
            pipe = self.pipe
            # Build the graph directly from the pipeline's pieces (the
            # pipeline's own methods jit internally, which would nest).
            from ..diffusion.sampling import sid_sampler

            def eval_fn(ema, vae_p, z, emb, rng):
                apply = lambda x, t, c: pipe.unet.apply({"params": ema}, x, t, c)
                init_t = jnp.full((z.shape[0],), self.cfg.init_timestep, jnp.int32)
                x0 = sid_sampler(apply, z, emb, init_t, pipe.scheduler,
                                 num_steps=num_steps_eval, rng=rng,
                                 dtype=pipe.dtype)
                img = pipe.vae.apply(
                    {"params": vae_p},
                    x0 / pipe.config.vae.scaling_factor,
                    method=pipe.vae.decode,
                )
                return jnp.clip(
                    img.astype(jnp.float32) * 127.5 + 128.0, 0, 255
                ).astype(jnp.uint8)

            if self._vae_global is None:
                self._vae_global = jax.tree_util.tree_map(
                    lambda p, s: global_put(p, s),
                    self.pipe.params["vae"],
                    param_shardings(self.pipe.params["vae"], self.mesh),
                )
            rep = replicated_sharding(self.mesh)
            jitted = jax.jit(
                eval_fn,
                in_shardings=(
                    param_shardings(self.state.ema, self.mesh),
                    param_shardings(self._vae_global, self.mesh),
                    batch_sharding(self.mesh, z.ndim),
                    batch_sharding(self.mesh, emb_g.ndim),
                    rep,
                ),
                out_shardings=rep,
            )
            # AOT-compile + barrier before the first dispatch (same Gloo
            # 30s context-creation race as the train step, see train_step).
            from ..ops.attention import shard_mesh_scope

            with shard_mesh_scope(self.mesh):
                self._eval_jits[key] = jitted.lower(
                    self.state.ema, self._vae_global, z, emb_g,
                    jax.random.PRNGKey(2024),
                ).compile()
            runtime.sync_hosts(f"eval-compiled-{len(self._eval_jits)}")
        from ..ops.attention import shard_mesh_scope

        with shard_mesh_scope(self.mesh):
            imgs = self._eval_jits[key](
                self.state.ema, self._vae_global, z, emb_g,
                jax.random.PRNGKey(2024),
            )
        return np.asarray(imgs)[:n]

    def sample_grid(self, kimg: int, num_steps_eval: int = 1, n: int = 16) -> str:
        """Deterministic sample grid (reference temporary_seed=2024 pattern).

        Collective on multi-process meshes (every host computes the same
        grid); the PNG write is host-0 only."""
        rng = np.random.RandomState(2024)
        idx = rng.randint(len(self.prompts.dataset), size=n)
        prompts = [self.prompts.dataset[i] for i in idx]
        lat = seeded_latents(list(range(n)), self.dcfg.latent_size,
                             self.dcfg.latent_channels)
        imgs = self._eval_images(prompts, lat, num_steps_eval)
        # Reference naming: fakes_{alpha:03f}_{kimg:06d}_{steps}.png
        # (sid_training_loop.py:614).
        path = os.path.join(
            self.cfg.run_dir,
            f"fakes_{self.cfg.alpha:03f}_{kimg:06d}_{num_steps_eval:d}.png",
        )
        if runtime.get_process_index() == 0:
            save_image_grid(imgs, path)
        return path

    @staticmethod
    def _flush_metrics(pending: list) -> None:
        """Drain queued per-step metric futures into training_stats (one host
        sync per tick/flush instead of per step)."""
        for m in pending:
            training_stats.report("fake_score_Loss/loss", float(m["fake_score_loss"]))
            training_stats.report("G_Loss/loss", float(m["g_loss"]))
            if "adv_d_loss" in m:
                training_stats.report("Adv/d_loss", float(m["adv_d_loss"]))
                training_stats.report("Adv/d_logit_real", float(m["d_logit_real"]))
                training_stats.report("Adv/d_logit_fake", float(m["d_logit_fake"]))
            if "adv_g_loss" in m:
                training_stats.report("Adv/g_loss", float(m["adv_g_loss"]))
        pending.clear()

    # ---------------------------------------------------------------- loop
    def run(self) -> SiDState:
        cfg = self.cfg
        # Sampling uses the current EMA params.
        self.pipe.params = dict(self.pipe.params)
        rng = jax.random.PRNGKey(cfg.seed)
        cur_nimg = int(self.state.nimg)
        tick_start_nimg = cur_nimg
        cur_tick = 0
        start_time = time.time()
        tick_start_time = start_time
        maintenance_time = 0.0
        stats_jsonl = None
        collector = training_stats.Collector(regex=".*")
        runtime.print0(f"Training for {cfg.total_kimg} kimg (batch {cfg.batch_size}, "
                       f"{self.a_rounds} accumulation rounds)...")
        step_idx = 0
        profiling = False
        pending_metrics: list = []
        while True:
            if cfg.profile_dir and step_idx == cfg.profile_start_step:
                from ..utils.misc import start_profiler_trace

                start_profiler_trace(cfg.profile_dir)
                profiling = True
            batch = self.next_batch()
            self.state, metrics = self.train_step(self.state, self.teacher, batch, rng)
            if self._refresh_spectral is not None:
                # Persistent spectral-norm u: track the kernels this step just
                # updated (device-side chain, no host sync; one-step lag —
                # torch spectral_norm semantics, see refresh_spectral_u).
                self._disc_frozen = dict(
                    self._disc_frozen,
                    spectral=self._refresh_spectral(
                        self.state.params_fake["disc"],
                        self._disc_frozen["spectral"]),
                )
            if profiling and step_idx + 1 >= cfg.profile_start_step + cfg.profile_steps:
                from ..utils.misc import stop_profiler_trace

                jax.block_until_ready(metrics)
                stop_profiler_trace()
                profiling = False
                runtime.print0(f"profiler trace written to {cfg.profile_dir}")
            step_idx += 1
            cur_nimg += cfg.batch_size
            # No per-step host sync: keep the metric scalars as device futures
            # so the NEXT batch's host-side prompt encoding overlaps the
            # device step (round-1 weak spot: float() here serialized them).
            pending_metrics.append(metrics)
            if len(pending_metrics) >= 256:
                self._flush_metrics(pending_metrics)

            done = cur_nimg >= cfg.total_kimg * 1000
            if cfg.max_ticks is not None and cur_tick >= cfg.max_ticks:
                done = True
            if (not done) and (cur_tick != 0) and (
                cur_nimg < tick_start_nimg + cfg.kimg_per_tick * 1000
            ):
                continue

            # ---- tick ----
            self._flush_metrics(pending_metrics)
            tick_end_time = time.time()
            collector.update()
            fields = EasyDict()
            fields.tick = cur_tick
            fields.kimg = cur_nimg / 1000.0
            fields.time = format_time(tick_end_time - start_time)
            fields.sec_per_tick = tick_end_time - tick_start_time
            fields.sec_per_kimg = fields.sec_per_tick / max(
                (cur_nimg - tick_start_nimg) / 1000.0, 1e-8
            )
            fields.maintenance = maintenance_time
            fields.fake_loss = collector.mean("fake_score_Loss/loss")
            fields.g_loss = collector.mean("G_Loss/loss")
            from ..utils.misc import cpu_memory_gb, peak_device_memory_gb

            fields.cpumem_gb = cpu_memory_gb()
            fields.devmem_gb = peak_device_memory_gb()
            runtime.print0(
                f"tick {fields.tick:<5d} kimg {fields.kimg:<9.1f} "
                f"time {fields.time:<12s} sec/tick {fields.sec_per_tick:<8.1f} "
                f"sec/kimg {fields.sec_per_kimg:<8.2f} "
                f"fake_loss {fields.fake_loss:<10.4f} g_loss {fields.g_loss:<10.4f} "
                f"cpumem {fields.cpumem_gb:<6.2f} devmem {fields.devmem_gb:<6.2f}"
            )
            maintenance_start = time.time()
            if runtime.get_process_index() == 0 and os.path.isdir(cfg.run_dir):
                if stats_jsonl is None:
                    stats_jsonl = open(
                        os.path.join(cfg.run_dir, f"stats_{cfg.alpha:g}.jsonl"), "at"
                    )
                stats_jsonl.write(json.dumps(
                    {**{k: float(v) if isinstance(v, (int, float)) else v
                        for k, v in fields.items()},
                     "timestamp": time.time()}) + "\n")
                stats_jsonl.flush()
            # Everything below is COLLECTIVE on multi-process meshes (grids,
            # snapshot gathers and metric loops all involve every host; file
            # writes stay host-0 inside).  run_dir is on a shared filesystem,
            # so the isdir gates agree across hosts.
            # Grid cadence parity (sid_training_loop.py:597-614): grids for
            # num_steps_eval in [1,2,4] unconditionally, on the uniform
            # cadence PLUS an early-tick list (dense visual feedback while
            # training finds its feet) and on the final tick.
            want_grids = (
                cfg.sample_ticks and os.path.isdir(cfg.run_dir)
                and (done or cur_tick % cfg.sample_ticks == 0
                     or cur_tick in EARLY_SAMPLE_TICKS)
            )
            if want_grids:
                self.pipe.params["generator"] = self.state.ema
                for nse in (1, 2, 4):
                    self.sample_grid(cur_nimg // 1000, num_steps_eval=nse)
            if cfg.snapshot_ticks and cur_tick and cur_tick % cfg.snapshot_ticks == 0:
                snap_path = (
                    self.save_snapshot(cur_nimg // 1000)
                    if os.path.isdir(cfg.run_dir) else None
                )
                if cfg.metrics and cfg.metric_ticks and cur_tick % cfg.metric_ticks == 0:
                    self.eval_metrics(snap_path)
            if cfg.state_dump_ticks and cur_tick and cur_tick % cfg.state_dump_ticks == 0:
                self.save_state(int(self.state.step))
            maintenance_time = time.time() - maintenance_start
            cur_tick += 1
            tick_start_nimg = cur_nimg
            tick_start_time = time.time()
            if done or runtime.should_stop():
                break
        if self.ckpt_mgr is not None:
            self.ckpt_mgr.wait()
            self.ckpt_mgr.close()
            self.ckpt_mgr = None
        runtime.print0("Exiting...")
        return self.state


def training_loop(cfg: TrainConfig) -> SiDState:
    """Build run dir artifacts + run (reference training_loop:148 entry)."""
    if runtime.get_process_index() == 0 and cfg.run_dir and cfg.run_dir != ".":
        os.makedirs(cfg.run_dir, exist_ok=True)
        with open(os.path.join(cfg.run_dir, "training_options.json"), "w") as f:
            f.write(cfg.as_json())
    trainer = Trainer(cfg)
    if cfg.resume == "latest":
        trainer.restore_state()
    elif cfg.resume and os.path.isdir(os.path.join(cfg.resume, "checkpoints")):
        # Resume from a previous run dir: restore the full training state
        # (reference --resume_training path, sid_train.py:279-284 +
        # sid_training_loop.py:296-311; RNG-independent by construction).
        from ..runtime.checkpoint import CheckpointManager

        mgr = CheckpointManager(os.path.join(cfg.resume, "checkpoints"))
        trainer.restore_from(mgr)
        runtime.print0(f"Resumed training state from {cfg.resume} "
                       f"(step {int(trainer.state.step)})")
    elif cfg.resume:
        # Initialise all three nets from a generator snapshot
        # (reference --resume pkl path).
        from ..runtime.checkpoint import load_generator_params

        gen = load_generator_params(cfg.resume, trainer.pipe.config.unet)
        gen = shard_params(gen, trainer.mesh)
        # Each destination needs its OWN buffers: the train step donates the
        # whole state, and XLA rejects donating one buffer twice (G and EMA
        # seeded from the same snapshot would alias).
        copy = lambda: jax.tree_util.tree_map(lambda p: p.copy(), gen)
        # params_fake must KEEP its initialized structure: a LoRA psi stays a
        # factor tree (the snapshot is a full UNet), and the pixel tower's
        # {'psi','disc'} wrapper keeps its heads — only a full-UNet psi is
        # seeded from the snapshot (reference --resume loads G/EMA/fake alike,
        # sid_training_loop.py:296-311, but its fake net is always full).
        pf = trainer.state.params_fake
        if not cfg.fake_score_use_lora:
            pf = (dict(pf, psi=copy()) if trainer._pixel_disc is not None
                  else copy())
        trainer.state = dataclasses.replace(
            trainer.state, params_G=gen, params_fake=pf, ema=copy()
        )
    return trainer.run()
