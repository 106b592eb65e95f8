"""Kernel implementation registry.

TPU-native counterpart of the reference's ``impl='cuda'|'ref'`` dual-path
pattern (``torch_utils/ops/bias_act.py:58,89-92``) and of the JIT plugin
loader's role (``torch_utils/custom_ops.py:get_plugin:46``): every hot op has a
``'ref'`` (pure jnp — XLA fuses it) and optionally a ``'pallas'`` (hand-tiled
Mosaic kernel) implementation, selected globally or per-call.

``'auto'`` resolves to 'pallas' on TPU backends and 'ref' elsewhere, with a
per-op eligibility predicate (e.g. pallas groupnorm only where the block fits
VMEM).  Override globally with ``set_default_impl`` or the environment
variable ``SIDLSG_OPS_IMPL`` in {'auto','ref','pallas'}.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import jax

_OPS: Dict[str, Dict[str, Callable]] = {}
_default_impl = os.environ.get("SIDLSG_OPS_IMPL", "auto")


def register_op(name: str, impl: str, fn: Callable) -> Callable:
    _OPS.setdefault(name, {})[impl] = fn
    return fn


def list_ops() -> Dict[str, list]:
    return {k: sorted(v) for k, v in _OPS.items()}


def set_default_impl(impl: str) -> None:
    global _default_impl
    assert impl in ("auto", "ref", "pallas")
    _default_impl = impl


def get_default_impl() -> str:
    return _default_impl


def _on_tpu() -> bool:
    try:
        if jax.default_backend() == "tpu":
            return True
        # Plugin backends (e.g. 'axon') expose TPU devices under another name.
        d = jax.devices()[0]
        return "tpu" in (getattr(d, "platform", "") or "").lower() or "TPU" in str(d)
    except Exception:
        return False


# Ops whose pallas impl routes ITSELF through a shard_map manual region on
# >1-device meshes (ops/attention.py:set_shard_mesh).  Every other Mosaic
# kernel would hit GSPMD's "Mosaic kernels cannot be automatically
# partitioned" at compile time when traced under a registered mesh, so
# impl_for falls them back to 'ref' (XLA partitions the jnp form fine —
# these are elementwise/reduction ops where 'ref' is already competitive).
_SHARD_MAP_AWARE = frozenset({"attention"})


def _shard_mesh_active() -> bool:
    # NOTE: ``from . import attention`` would resolve to the *function* the
    # package __init__ re-exports under the same name, not the module.
    import importlib

    attention = importlib.import_module(__package__ + ".attention")
    return attention._SHARD_MESH is not None


def impl_for(name: str, impl: Optional[str] = None, pallas_ok: bool = True) -> Callable:
    """Resolve the implementation to call for op ``name``.

    ``pallas_ok`` lets the op's own eligibility check (shape/VMEM constraints)
    veto the pallas path even when requested by 'auto'.
    """
    choice = impl or _default_impl
    impls = _OPS[name]
    if pallas_ok and name not in _SHARD_MAP_AWARE and _shard_mesh_active():
        pallas_ok = False  # see _SHARD_MAP_AWARE
    if choice == "auto":
        choice = "pallas" if (_on_tpu() and pallas_ok and "pallas" in impls) else "ref"
    if choice == "pallas" and ("pallas" not in impls or not pallas_ok):
        choice = "ref"
    return impls[choice]
