"""Feature detector factories for the metric stack.

Counterpart of reference ``get_feature_detector`` (``sid_metric_utils.py:98``
— URL-cached TorchScript InceptionV3) and the dill-cached open_clip detector
(``:80-90``).  Detectors resolve weights from ``SIDLSG_INCEPTION_WEIGHTS`` /
``SIDLSG_CLIP_WEIGHTS`` env paths or explicit arguments; without weights they
fall back to seeded random parameters so the full metric plumbing stays
runnable offline (numbers are then NOT comparable across machines — flagged
loudly on stderr).
"""

from __future__ import annotations

import functools
import os
import sys
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4)
def _inception_apply(weights_path: Optional[str]):
    from ..models.inception import InceptionV3Features, load_inception_params

    model = InceptionV3Features()
    params = load_inception_params(weights_path)
    if not weights_path:
        print(
            "[sid_lsg_tpu.metrics] WARNING: InceptionV3 running with random "
            "weights (set SIDLSG_INCEPTION_WEIGHTS for comparable FID).",
            file=sys.stderr,
        )
    return jax.jit(lambda imgs: model.apply({"params": params}, imgs))


def inception_detector(weights_path: Optional[str] = None) -> Callable:
    """uint8 (B,H,W,3) -> (B, 2048) float32 FID features."""
    weights_path = weights_path or os.environ.get("SIDLSG_INCEPTION_WEIGHTS") or None
    apply = _inception_apply(weights_path)

    def detect(images: np.ndarray) -> np.ndarray:
        return np.asarray(apply(jnp.asarray(images)))

    return detect


@functools.lru_cache(maxsize=2)
def clip_scorer(weights_path: Optional[str] = None, preset: str = "auto"):
    """Joint CLIP scorer (reference's open_clip ViT-g-14 role; the hpsv2
    metric feeds it a ViT-H-14 checkpoint)."""
    from ..models.clip_vision import (
        TINY_CLIP, VIT_G_14, VIT_H_14, CLIPScorer, config_from_open_clip,
        convert_open_clip,
    )

    weights_path = weights_path or os.environ.get("SIDLSG_CLIP_WEIGHTS") or None
    if weights_path:
        from ..models.convert import load_torch_state_dict

        sd = load_torch_state_dict(weights_path)
        if preset == "auto":
            # Derive the tower from the checkpoint's own shapes: ViT-g-14
            # (metrics), ViT-H-14 (HPSv2) and tiny test towers all convert
            # through one path.  A preset-guess of g-14 would KeyError on any
            # other depth.
            cfg = config_from_open_clip(sd)
        else:
            cfg = {"vit_g_14": VIT_G_14, "vit_h_14": VIT_H_14,
                   "tiny": TINY_CLIP}[preset]
        params = convert_open_clip(sd, cfg)
        return CLIPScorer(cfg, params=params)
    print(
        "[sid_lsg_tpu.metrics] WARNING: CLIP scorer running with random tiny "
        "weights (set SIDLSG_CLIP_WEIGHTS for comparable CLIP scores).",
        file=sys.stderr,
    )
    return CLIPScorer(TINY_CLIP)
