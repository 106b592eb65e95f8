"""Device mesh + sharding rules: the framework's whole parallelism layer.

TPU-native replacement for the reference's process-per-GPU NCCL layer
(``torch_utils/distributed.py:14-31``, DDP wrap at
``training/sid_training_loop.py:316-323``, SURVEY.md §2.3).  One JAX process
controls all local chips; parallelism is expressed as a 2-D logical mesh:

- ``dp``   — pure data parallelism (the reference's only strategy).  Gradient
  all-reduce is emitted by XLA over ICI; no DDP machinery exists here.
- ``fsdp`` — ZeRO-style parameter/optimizer-state sharding, the reference's
  *announced-but-unimplemented* FSDP roadmap item (``README.md:11``).  Params
  are sharded along their largest divisible axis; XLA inserts all-gathers
  before use and reduce-scatters on the gradients.  The ``fsdp`` axis also
  carries batch shards (GSPMD convention), so total data parallelism is
  ``dp * fsdp``.

The rules below are deliberately simple pytree transforms: pick a mesh,
annotate every leaf with a ``NamedSharding``, let XLA place collectives.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
FSDP_AXIS = "fsdp"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """How to carve the device set.  ``fsdp=1`` -> pure DP (reference parity)."""

    fsdp: int = 1
    dp: Optional[int] = None  # None = all remaining devices

    def build(self, devices: Optional[Sequence[Any]] = None) -> Mesh:
        return make_mesh(fsdp=self.fsdp, dp=self.dp, devices=devices)


def make_mesh(
    fsdp: int = 1,
    dp: Optional[int] = None,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a ("dp", "fsdp") mesh over the given (default: all) devices.

    Axis order puts ``fsdp`` innermost so parameter all-gathers ride the
    fastest ICI links; ``dp`` gradient reductions tolerate the outer axis
    (cf. scaling-book mesh-layout recipe).
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if n % fsdp != 0:
        raise ValueError(f"{n} devices not divisible by fsdp={fsdp}")
    dp = dp if dp is not None else n // fsdp
    if dp * fsdp != n:
        raise ValueError(f"dp({dp}) * fsdp({fsdp}) != devices({n})")
    arr = np.asarray(devs).reshape(dp, fsdp)
    return Mesh(arr, (DP_AXIS, FSDP_AXIS))


def make_hybrid_mesh(fsdp: int = 1, dp_per_slice: Optional[int] = None) -> Mesh:
    """Multi-slice mesh: dp spans slices over DCN, fsdp stays inside a slice.

    SURVEY.md §2.3 stretch (multi-slice DCN data parallelism): parameter
    all-gathers (fsdp) must ride ICI, so fsdp is the inner per-slice axis;
    gradient psum over dp crosses DCN once per step — the bandwidth-correct
    layout per the scaling-book recipe.  Falls back to ``make_mesh`` in
    single-slice environments.
    """
    try:
        num_slices = 1 + max(
            getattr(d, "slice_index", 0) or 0 for d in jax.devices()
        )
    except Exception:
        num_slices = 1
    if num_slices <= 1:
        return make_mesh(fsdp=fsdp, dp=dp_per_slice)
    from jax.experimental import mesh_utils

    per_slice = len(jax.devices()) // num_slices
    if per_slice % fsdp != 0:
        raise ValueError(f"per-slice device count {per_slice} not divisible by fsdp={fsdp}")
    dp_inner = dp_per_slice if dp_per_slice is not None else per_slice // fsdp
    devices = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(dp_inner, fsdp),
        dcn_mesh_shape=(num_slices, 1),
        devices=jax.devices(),
    )
    return Mesh(devices.reshape(num_slices * dp_inner, fsdp), (DP_AXIS, FSDP_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 of data arrays over ALL devices (dp x fsdp combined)."""
    spec = P((DP_AXIS, FSDP_AXIS), *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_spec(shape: Sequence[int], fsdp_size: int, min_size: int) -> P:
    """Shard the largest axis divisible by the fsdp size; replicate otherwise.

    Small leaves (norm scales, biases) stay replicated — sharding them would
    cost a collective per use for a few KB of savings.
    """
    if fsdp_size <= 1 or int(np.prod(shape)) < min_size:
        return P()
    order = sorted(range(len(shape)), key=lambda i: shape[i], reverse=True)
    for i in order:
        if shape[i] % fsdp_size == 0 and shape[i] >= fsdp_size:
            spec: list = [None] * len(shape)
            spec[i] = FSDP_AXIS
            return P(*spec)
    return P()


def param_shardings(params: Any, mesh: Mesh, min_size: int = 2**16) -> Any:
    """Pytree of NamedShardings implementing the FSDP rule above.

    With ``fsdp=1`` in the mesh every leaf is replicated — exactly the
    reference's DDP placement (one full copy per device).
    """
    fsdp_size = mesh.shape[FSDP_AXIS]

    def leaf(p: Any) -> NamedSharding:
        return NamedSharding(mesh, _fsdp_spec(np.shape(p), fsdp_size, min_size))

    return jax.tree_util.tree_map(leaf, params)


def global_put(x: Any, sharding: NamedSharding) -> jax.Array:
    """Place a host value onto a (possibly cross-process) sharding, treating
    ``x`` as the GLOBAL value.

    Single-process this is ``device_put``.  Multi-process, ``device_put`` onto
    a non-addressable sharding performs a cross-process value-equality check
    (an allgather per leaf) before accepting the value; ``
    make_array_from_callback`` skips it — the caller guarantees every process
    passes the same value (true by construction here: deterministic init,
    shared checkpoints, fixed seeds)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def shard_params(params: Any, mesh: Mesh, min_size: int = 2**16) -> Any:
    """Place a (host or replicated) param pytree onto the mesh per the rules.

    Multi-process contract: every process passes the same global values
    (deterministic init or a shared checkpoint)."""
    shardings = param_shardings(params, mesh, min_size)
    return jax.tree_util.tree_map(global_put, params, shardings)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place host batch arrays onto the mesh, axis-0-sharded over all devices.

    Multi-process: ``batch`` must be the same GLOBAL value on every process
    (use ``shard_round_batch`` for per-process local slabs)."""

    def leaf(x: Any) -> Any:
        return global_put(x, batch_sharding(mesh, np.ndim(x)))

    return jax.tree_util.tree_map(leaf, batch)


# --------------------------------------------------------------------------
# Train-step batch layout: (A, mb, ...) per-accumulation-round arrays.  The
# microbatch axis (1) carries the data parallelism; the scan axis A stays
# unsharded.  Keys not in ROUND_BATCH_KEYS (uncond_emb) are replicated.
ROUND_BATCH_KEYS = ("emb_fake", "emb_g", "lat_real", "emb_real")


def rounds_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (A, mb, ...) arrays: microbatch axis over all devices.

    The PartitionSpec is a prefix — trailing dims are unsharded regardless of
    rank, so one sharding serves embeddings (A,mb,L,D) and latents
    (A,mb,h,w,c) alike.
    """
    return NamedSharding(mesh, P(None, (DP_AXIS, FSDP_AXIS)))


def batch_shardings(batch: Any, mesh: Mesh) -> dict:
    """Shardings for a train-step batch dict (keys decide the rule)."""
    rep = replicated_sharding(mesh)
    rnd = rounds_sharding(mesh)
    return {k: (rnd if k in ROUND_BATCH_KEYS else rep) for k in batch}


def process_local_rows(global_rows: int) -> int:
    """Rows of a (data-parallel) batch axis this process must produce.

    Multi-host data loading is process-strided (each host feeds a disjoint
    stream — reference ``InfiniteSampler`` rank striding); the per-process
    slab is 1/process_count of the global batch axis."""
    pc = jax.process_count()
    if global_rows % pc != 0:
        raise ValueError(
            f"global batch axis {global_rows} not divisible by "
            f"{pc} processes"
        )
    return global_rows // pc


def shard_round_batch(batch: dict, mesh: Mesh) -> dict:
    """Explicitly place a train-step batch onto the mesh (reference parity:
    DDP's fixed batch placement, ``training/sid_training_loop.py:316-323``).

    Called by the Trainer on every ``next_batch()`` output so GSPMD never has
    to infer batch placement from use sites.

    Multi-process semantics: for the ``ROUND_BATCH_KEYS`` (microbatch-axis
    data) each process passes its LOCAL slab — shape ``(A, mb_local, ...)``
    with ``mb_local = process_local_rows(microbatch)`` — and the global array
    is assembled across processes (each host's slab lands on its own chips;
    ``device_put`` would instead demand identical global values on every
    process, which per-host-disjoint data streams violate by design).
    Replicated keys (``uncond_emb``) must be identical on every process."""
    shardings = batch_shardings(batch, mesh)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
    out = {}
    for k, v in batch.items():
        if k in ROUND_BATCH_KEYS:
            out[k] = jax.make_array_from_process_local_data(
                shardings[k], np.asarray(v)
            )
        else:
            out[k] = global_put(v, shardings[k])
    return out


def activation_constraint(x: jax.Array, mesh: Optional[Mesh]) -> jax.Array:
    """``with_sharding_constraint`` pinning a (B, ...) activation to batch
    sharding over all mesh axes.  No-op without a >1-device mesh.

    Applied at the distillation step's phase boundaries (sampler outputs,
    denoise outputs) so XLA's SPMD partitioner never has to guess — the
    round-2 dryrun showed it guessing wrong ("Involuntary full
    rematerialization" reshards of activation-sized tensors).
    """
    if mesh is None or mesh.size <= 1:
        return x
    spec = P((DP_AXIS, FSDP_AXIS), *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
