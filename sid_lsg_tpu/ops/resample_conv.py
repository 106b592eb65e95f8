"""conv2d_resample, grid_sample and fma — the remaining N5/N6/N7 ops.

Capability parity with reference ``torch_utils/ops/conv2d_resample.py`` (N5 —
fused upfirdn + grouped conv choosing op order), ``grid_sample_gradfix.py``
(N6 — 2nd-order-grad bilinear sampling) and ``fma.py`` (N7).  On TPU:

- ``conv2d_resample`` composes the N2 upfirdn conv-formulation with one
  ``lax.conv_general_dilated`` — XLA fuses/reorders; both reference op orders
  are the same program after optimisation.
- ``grid_sample`` uses ``jax.scipy.ndimage.map_coordinates`` (order=1);
  arbitrary-order gradients hold by construction (the whole point of the
  reference's gradfix wrapper).
- ``fma`` is ``a*b+c``; XLA emits the fused multiply-add natively.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .upfirdn2d import _parse_padding, setup_filter, upfirdn2d


def conv2d_resample(
    x: jnp.ndarray,  # (B, C, H, W)
    w: jnp.ndarray,  # (O, I/groups, kh, kw)
    f: Optional[jnp.ndarray] = None,
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    groups: int = 1,
    flip_weight: bool = True,
) -> jnp.ndarray:
    """2D conv with optional FIR up/downsampling (reference N5 surface)."""
    kh, kw = int(w.shape[2]), int(w.shape[3])
    px0, px1, py0, py1 = _parse_padding(padding)
    if up > 1:
        if f is None:
            f = setup_filter(None)
        px0 += (f.shape[-1] + up - 1) // 2
        px1 += (f.shape[-1] - up) // 2
        py0 += (f.shape[0] + up - 1) // 2
        py1 += (f.shape[0] - up) // 2
        x = upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1], gain=up * up)
        px0 = px1 = py0 = py1 = 0
    if not flip_weight:  # true convolution
        w = jnp.flip(w, axis=(2, 3))
    x = jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 3, 1, 0)).astype(x.dtype), (1, 1),
        ((py0, py1), (px0, px1)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=groups,
    )
    if down > 1:
        if f is None:
            f = setup_filter(None)
        from .upfirdn2d import downsample2d

        x = downsample2d(x, f, down=down)
    return x


def grid_sample(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear grid sample, align_corners=False (reference N6 surface).

    x: (B, C, H, W); grid: (B, H_out, W_out, 2) in [-1, 1] (xy order).
    """
    b, c, h, w = x.shape
    gx = (grid[..., 0] + 1.0) * (w / 2.0) - 0.5
    gy = (grid[..., 1] + 1.0) * (h / 2.0) - 0.5

    def sample_one(img, cx, cy):  # img: (C,H,W)
        coords = jnp.stack([cy.ravel(), cx.ravel()])
        out = jax.vmap(
            lambda ch: jax.scipy.ndimage.map_coordinates(ch, coords, order=1, mode="constant")
        )(img)
        return out.reshape(c, *cx.shape)

    return jax.vmap(sample_one)(x, gx, gy)


def fma(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """a * b + c (reference N7; XLA fuses the multiply-add)."""
    return a * b + c
