"""up/FIR/down 2-D resampling (upfirdn2d) on TPU.

Capability parity with reference ``torch_utils/ops/upfirdn2d.py`` (ref impl at
lines 172-207, CUDA kernel ops/upfirdn2d.cu) — N2 in SURVEY.md §2.2.

TPU-native design: the whole pad -> zero-stuff upsample -> FIR -> downsample
pipeline is ONE ``lax.conv_general_dilated`` call — ``lhs_dilation`` performs
the upsample, the padding config performs pad/crop, ``window_strides`` performs
the downsample, and ``feature_group_count=C`` makes the FIR depthwise.  XLA
lowers this straight onto the convolution hardware, which *is* the
speed-of-light mapping for this op on TPU (a hand-written Pallas kernel would
re-derive the same schedule), so the conv formulation is registered as both
'ref' and the production path.  Arbitrary-order gradients come from JAX
autodiff (the reference needs a hand-written transposed-upfirdn VJP,
upfirdn2d.py:255-268).

API and semantics (NCHW, filter layout, gain = ``gain**(f.ndim/2)`` applied to
the filter, negative padding = crop, ``flip_filter=False`` meaning true
convolution) match the reference exactly; parity tests compare against a
direct numpy realisation.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np
from jax import lax

from .registry import impl_for, register_op

IntOrPair = Union[int, Sequence[int]]


def _parse_scaling(scaling: IntOrPair):
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding: IntOrPair):
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        padx, pady = padding
        padding = [padx, padx, pady, pady]
    padx0, padx1, pady0, pady1 = padding
    return int(padx0), int(padx1), int(pady0), int(pady1)


def setup_filter(
    f,
    normalize: bool = True,
    flip_filter: bool = False,
    gain: float = 1.0,
    separable: Optional[bool] = None,
) -> jnp.ndarray:
    """Prepare a FIR filter (reference upfirdn2d.py:setup_filter:75)."""
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in (0, 1, 2) and f.size > 0
    if f.ndim == 0:
        f = f[np.newaxis]
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    assert f.ndim == (1 if separable else 2)
    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = np.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return jnp.asarray(f, dtype=jnp.float32)


def _depthwise_conv(x, f2d, up, down, pad, channels):
    """One conv_general_dilated realising zero-stuff + pad/crop + FIR + stride."""
    upx, upy = up
    downx, downy = down
    padx0, padx1, pady0, pady1 = pad
    # lhs_dilation yields length (n-1)*up+1; the reference's upsample yields
    # n*up (with up-1 trailing zeros), so fold the missing zeros into padding.
    pad_cfg = ((pady0, pady1 + (upy - 1)), (padx0, padx1 + (upx - 1)))
    w = jnp.tile(f2d[:, :, jnp.newaxis, jnp.newaxis], (1, 1, 1, channels))  # HWIO, I=1
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(downy, downx),
        padding=pad_cfg,
        lhs_dilation=(upy, upx),
        rhs_dilation=(1, 1),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=channels,
    )


def _upfirdn2d_ref(x, f, up, down, padding, flip_filter, gain):
    assert x.ndim == 4
    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    assert f.ndim in (1, 2)
    _, num_channels, _, _ = x.shape
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    pad = _parse_padding(padding)

    f = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))

    if f.ndim == 2:
        return _depthwise_conv(x, f, (upx, upy), (downx, downy), pad, num_channels)
    # Separable: vertical pass (up/pad/down in y), then horizontal.
    padx0, padx1, pady0, pady1 = pad
    x = _depthwise_conv(
        x, f[:, jnp.newaxis], (1, upy), (1, downy), (0, 0, pady0, pady1), num_channels
    )
    x = _depthwise_conv(
        x, f[jnp.newaxis, :], (upx, 1), (downx, 1), (padx0, padx1, 0, 0), num_channels
    )
    return x


register_op("upfirdn2d", "ref", _upfirdn2d_ref)


def upfirdn2d(
    x: jnp.ndarray,
    f: Optional[jnp.ndarray],
    up: IntOrPair = 1,
    down: IntOrPair = 1,
    padding: IntOrPair = 0,
    flip_filter: bool = False,
    gain: float = 1.0,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Pad, upsample, FIR-filter, and downsample a batch of NCHW images."""
    fn = impl_for("upfirdn2d", impl, pallas_ok=False)
    return fn(x, f, up, down, padding, flip_filter, gain)


def filter2d(x, f, padding=0, flip_filter=False, gain=1.0, impl=None):
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = (f.shape[-1], f.shape[0]) if f is not None else (1, 1)
    p = [padx0 + fw // 2, padx1 + (fw - 1) // 2, pady0 + fh // 2, pady1 + (fh - 1) // 2]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain, impl=impl)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1.0, impl=None):
    upx, upy = _parse_scaling(up)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = (f.shape[-1], f.shape[0]) if f is not None else (1, 1)
    p = [
        padx0 + (fw + upx - 1) // 2,
        padx1 + (fw - upx) // 2,
        pady0 + (fh + upy - 1) // 2,
        pady1 + (fh - upy) // 2,
    ]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy, impl=impl)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1.0, impl=None):
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = (f.shape[-1], f.shape[0]) if f is not None else (1, 1)
    p = [
        padx0 + (fw - downx + 1) // 2,
        padx1 + (fw - downx) // 2,
        pady0 + (fh - downy + 1) // 2,
        pady1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain, impl=impl)
