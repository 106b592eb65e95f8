"""Checkpointing: orbax training state + portable generator snapshots +
reference-format interop.

Replaces the reference's two artifact kinds (SURVEY.md §5):
1. training state ``training-state-*.pt`` (whole torch modules + optimizer
   state_dicts, ``sid_training_loop.py:654-656``) -> an orbax
   ``CheckpointManager`` over the ``SiDState`` pytree (sharded-save capable,
   step in metadata, RNG-independent resume).
2. snapshots ``network-snapshot-{alpha}-{kimg}.pkl`` (``{'ema': torch
   module}`` pickles, ``:641-651``) -> flat safetensors exports of the EMA
   generator params (portable, mmap-loadable, no code execution on load).

Interop: ``load_generator_params`` also reads the reference's own artifacts —
torch-pickled ``{'ema': module}`` snapshots (without requiring diffusers to be
installed: a stub-module unpickler recovers the parameter tree) and raw torch
state-dict files — so parity experiments can start from published SiD-LSG
checkpoints (HF ``UT-Austin-PML/SiD-LSG``).
"""

from __future__ import annotations

import contextlib
import os
import sys
import types
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..models.configs import UNetConfig
from ..models.convert import convert_unet


# ---------------------------------------------------------------------------
# Torch-pickle interop (no diffusers required)


_STUB_MODULE_NAMES = [
    "diffusers",
    "diffusers.models",
    "diffusers.models.unets",
    "diffusers.models.unets.unet_2d_condition",
    "diffusers.models.unet_2d_condition",
    "dnnlib",
    "dnnlib.util",
    "torch_utils",
    "torch_utils.persistence",
]


@contextlib.contextmanager
def _stub_modules():
    """Temporarily install importable stubs for the classes reference pickles
    refer to.

    torch pickles store ``(module, qualname)`` references; unpickling only
    needs *a* class with that name — object state arrives via ``__dict__``
    update, no ``__init__`` call.  torch.nn.Module subclasses keep all tensors
    under ``_parameters``/``_buffers``/``_modules``, which
    ``torch_pickle_state_dict`` walks generically.

    Scoped: sys.modules is restored afterwards, so the stubs can never shadow
    a later real import of e.g. the reference's own ``torch_utils`` package
    (which the torch-parity tests import from a checkout).
    """

    class _Stub:
        def __init__(self, *a, **k):
            pass

        def __setstate__(self, state):
            if isinstance(state, dict):
                self.__dict__.update(state)

    saved = {n: sys.modules.get(n) for n in _STUB_MODULE_NAMES}
    for mod_name in _STUB_MODULE_NAMES:
        if sys.modules.get(mod_name) is None:
            m = types.ModuleType(mod_name)
            m.__getattr__ = lambda name, _m=mod_name: _Stub if name[:1].isupper() else types.ModuleType(f"{_m}.{name}")  # type: ignore[assignment]
            sys.modules[mod_name] = m
    try:
        yield
    finally:
        for mod_name, prev in saved.items():
            if prev is None:
                sys.modules.pop(mod_name, None)
            else:
                sys.modules[mod_name] = prev


def _walk_module_tree(obj: Any, prefix: str, out: Dict[str, np.ndarray]) -> None:
    """Extract tensors from an unpickled torch-module object graph."""
    d = getattr(obj, "__dict__", None)
    if not isinstance(d, dict):
        return
    for name, t in (d.get("_parameters") or {}).items():
        if t is not None:
            out[prefix + name] = np.asarray(t.detach().to("cpu").float().numpy())
    for name, t in (d.get("_buffers") or {}).items():
        if t is not None:
            out[prefix + name] = np.asarray(t.detach().to("cpu").float().numpy())
    for name, child in (d.get("_modules") or {}).items():
        if child is not None:
            _walk_module_tree(child, f"{prefix}{name}.", out)


def torch_pickle_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference snapshot/state pickle into a flat numpy state dict.

    Handles ``{'ema': module}`` snapshots, ``{'G': ..., 'G_ema': ...}``
    training states, bare modules and bare state dicts.
    """
    import torch

    with _stub_modules():
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("ema", "G_ema", "G", "model", "state_dict"):
            if key in obj:
                obj = obj[key]
                break
    if isinstance(obj, dict):  # already a state dict of tensors
        return {
            k: np.asarray(v.detach().to("cpu").float().numpy())
            for k, v in obj.items()
            if hasattr(v, "detach")
        }
    if hasattr(obj, "state_dict"):
        try:
            return {
                k: np.asarray(v.detach().to("cpu").float().numpy())
                for k, v in obj.state_dict().items()
            }
        except Exception:
            pass  # stub modules have no real state_dict(); walk the tree
    out: Dict[str, np.ndarray] = {}
    _walk_module_tree(obj, "", out)
    if not out:
        raise ValueError(f"could not extract tensors from {path}")
    return out


# ---------------------------------------------------------------------------
# Generator snapshot export / load


def _flatten(tree: dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _needs_gather(x: Any) -> bool:
    return isinstance(x, jax.Array) and not (
        x.is_fully_addressable or x.is_fully_replicated
    )


def fetch_to_host(x: Any) -> np.ndarray:
    """Materialise an array on the host, gathering cross-process shards.

    Leaves that are fully addressable or fully replicated read locally;
    fsdp-sharded leaves on a multi-host mesh need a collective gather — so on
    >1 processes this must be called by EVERY process (even when only host 0
    writes the result), or the gather deadlocks.  For whole param trees use
    ``fetch_tree_to_host`` (ONE collective program instead of one per leaf)."""
    if _needs_gather(x):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def fetch_tree_to_host(tree: Any) -> Any:
    """``fetch_to_host`` over a pytree with ONE process_allgather for all the
    cross-process-sharded leaves — per-leaf gathers would compile and dispatch
    a separate collective program per parameter at every snapshot/metric tick.
    Collective: every process must call it with the same tree."""
    flat, treedef = jax.tree_util.tree_flatten(tree)
    need = [i for i, x in enumerate(flat) if _needs_gather(x)]
    if need:
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(
            [flat[i] for i in need], tiled=True
        )
        for i, g in zip(need, gathered):
            flat[i] = g
    return treedef.unflatten([np.asarray(x) for x in flat])


def export_generator(params: dict, path: str) -> None:
    """EMA generator params -> one safetensors file with '/'-joined keys
    (the portable snapshot replacing the reference's code-carrying pickles).

    Collective on multi-host meshes (see ``fetch_tree_to_host``): every
    process must call it; only process 0 writes the file."""
    from safetensors.numpy import save_file

    host = fetch_tree_to_host(params)
    if jax.process_index() != 0:
        return
    tmp = path + ".tmp"
    save_file(_flatten(host), tmp)
    os.replace(tmp, path)  # atomic, like reference dnnlib/util.py:482-484


def load_generator_params(path: str, unet_cfg: Optional[UNetConfig] = None) -> dict:
    """Load generator params from any supported artifact (see module doc)."""
    if os.path.isdir(path):  # orbax checkpoint dir -> restore raw pytree
        import orbax.checkpoint as ocp

        return ocp.StandardCheckpointer().restore(os.path.abspath(path))
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        flat = load_file(path)
        if any("/" in k for k in flat):
            return _unflatten(dict(flat))
        if unet_cfg is None:
            raise ValueError("HF-style safetensors needs a UNetConfig to convert")
        return convert_unet(dict(flat), unet_cfg)
    # torch pickle (.pkl snapshot / .pt state / .bin weights)
    sd = torch_pickle_state_dict(path)
    if unet_cfg is None:
        raise ValueError("torch checkpoints need a UNetConfig to convert")
    return convert_unet(sd, unet_cfg)


def _match_template_shardings(restored: Any, template: Any) -> Any:
    """Re-pin restored leaves to the template's shardings where orbax didn't.

    ``StandardRestore(template)`` honors the template sharding for array
    leaves, but 0-d scalars (step counters, nimg, optimizer counts) come back
    ``SingleDeviceSharding`` — harmless single-process (jit re-shards an
    addressable array), FATAL on a multi-process mesh where the train step's
    explicit in_shardings require NamedSharding(mesh, P()) and cross-process
    resharding is impossible (found by
    tests/test_multiprocess.py::test_two_process_fsdp_training's resume leg).
    Mismatched leaves must be fully addressable (replicated/scalar — sharded
    leaves restore with correct shardings); rebuilt with
    ``make_array_from_callback`` which handles shardings spanning
    non-addressable devices."""

    def fix(r, t):
        t_sharding = getattr(t, "sharding", None)
        if t_sharding is None or (
            isinstance(r, jax.Array) and r.sharding == t_sharding
        ):
            return r
        arr = np.asarray(r)
        return jax.make_array_from_callback(arr.shape, t_sharding,
                                            lambda idx: arr[idx])

    return jax.tree_util.tree_map(fix, restored, template)


# ---------------------------------------------------------------------------
# Orbax training-state manager


class CheckpointManager:
    """Thin orbax wrapper: save/restore the full ``SiDState`` + step metadata.

    Saves are sharding-aware (each host writes its shards) and atomic;
    ``latest_step``/``restore`` replace the reference's filename-parsing
    resume (``sid_train.py:46-73,279-284``).
    """

    def __init__(self, directory: str, max_to_keep: int = 5):
        import orbax.checkpoint as ocp

        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint to restore")
        if template is None:
            return self._mgr.restore(step)
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return _match_template_shardings(restored, template)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
