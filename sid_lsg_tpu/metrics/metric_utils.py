"""Shared metric machinery: dataset/generator feature loops with caching.

Counterpart of reference ``metrics/sid_metric_utils.py``:
``compute_feature_stats_for_dataset`` (:237 — md5-keyed stats cache 247-263,
rank-strided subset 274) and ``compute_feature_stats_for_generator`` (:412 —
caption-prompted generation loop 461-506, resize-to-eval-resolution 477,
CLIP-score accumulation 491-504).  Generation is prompt-deterministic: image
i uses per-seed latents ``seed=i`` and caption i, exactly the
``generate_onestep`` eval protocol, so metric results are reproducible from
``(generator params, dataset)`` alone.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional, Tuple

import numpy as np

from ..data.mscoco import CocoCaptionDataset
from ..diffusion.rng import StackedRandomGenerator
from ..parallel import runtime
from .feature_stats import FeatureStats, ProgressMonitor
from .registry import MetricOptions


def _resize_uint8(images: np.ndarray, size: int,
                  workers: int | None = None) -> np.ndarray:
    """Bicubic uint8 resize on host via PIL (matches reference make_transform
    semantics for eval, sid_metric_utils.py:299,477).

    Thread-pooled like ``models.clip_vision.openclip_preprocess_uint8``: PIL
    releases the GIL in the C resampler and each thread writes only its own
    output row, so results are byte-identical at any worker count."""
    if images.shape[1] == size and images.shape[2] == size:
        return images
    from PIL import Image

    out = np.empty((images.shape[0], size, size, 3), np.uint8)

    def one(i: int) -> None:
        out[i] = np.asarray(
            Image.fromarray(images[i]).resize((size, size), Image.BICUBIC))

    nw = workers if workers is not None else min(8, os.cpu_count() or 1)
    if nw <= 1 or len(images) <= 1:
        for i in range(len(images)):
            one(i)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=nw) as pool:
            list(pool.map(one, range(len(images))))
    return out


def compute_feature_stats_for_dataset(
    opts: MetricOptions,
    max_items: Optional[int] = None,
    capture_all: bool = False,
    capture_mean_cov: bool = True,
    detector_name: str = "inception",
) -> FeatureStats:
    assert opts.dataset_path, "dataset_path required for real-image stats"
    dataset = CocoCaptionDataset(opts.dataset_path, resolution=opts.resolution)
    n = len(dataset) if max_items is None else min(len(dataset), max_items)

    # md5 cache over the defining arguments (reference :247-263); the detector
    # weights path is part of the key so swapping weights invalidates stats.
    detector_id = (detector_name, os.environ.get("SIDLSG_INCEPTION_WEIGHTS", ""))
    cache_tag = hashlib.md5(
        repr((os.path.abspath(opts.dataset_path), detector_id, n,
              opts.resolution, capture_all)).encode()
    ).hexdigest()
    cache_file = os.path.join(opts.cache_dir, f"real-stats-{dataset.name}-{cache_tag}.pkl")
    if os.path.isfile(cache_file):
        return FeatureStats.load(cache_file)

    stats = FeatureStats(capture_all=capture_all, capture_mean_cov=capture_mean_cov,
                         max_items=n)
    progress = ProgressMonitor("dataset features", n, verbose=opts.verbose)
    done = 0
    for images, _ in dataset.batches(
        opts.batch_size,
        process_index=runtime.get_process_index(),
        process_count=runtime.get_process_count(),
        max_items=n,
    ):
        stats.append(np.asarray(opts.detector(images)))
        done += len(images)
        progress.update(done)
    stats.merge_across_processes()
    if runtime.get_process_index() == 0:
        os.makedirs(opts.cache_dir, exist_ok=True)
        stats.save(cache_file)
    return stats


def compute_feature_stats_for_generator(
    opts: MetricOptions,
    max_items: Optional[int] = None,
    capture_all: bool = False,
    capture_mean_cov: bool = True,
    with_clip_score: bool = False,
) -> Tuple[FeatureStats, Optional[float]]:
    """Generate caption-prompted images and stream them through the detector.

    Returns (stats, mean CLIP score or None).
    """
    assert opts.pipe is not None, "pipe required for generator stats"
    n = opts.num_gen if max_items is None else max_items
    dataset = CocoCaptionDataset(opts.dataset_path) if opts.dataset_path else None
    captions = dataset.captions() if dataset else [""]

    stats = FeatureStats(capture_all=capture_all, capture_mean_cov=capture_mean_cov,
                         max_items=n)
    progress = ProgressMonitor("generator features", n, verbose=opts.verbose)
    clip_sum, clip_count = 0.0, 0
    latent_size = opts.pipe.config.unet.sample_size
    pi, pc = runtime.get_process_index(), runtime.get_process_count()
    my_ids = list(range(pi, n, pc))
    import jax

    for start in range(0, len(my_ids), opts.batch_size):
        ids = my_ids[start : start + opts.batch_size]
        pad = opts.batch_size - len(ids)
        padded = ids + ids[:1] * pad
        prompts = [captions[i % len(captions)] for i in padded]
        latents = StackedRandomGenerator(padded).randn(
            (len(padded), latent_size, latent_size, 4)
        )
        images = opts.pipe.generate(
            prompts, latents,
            num_steps=opts.num_steps_eval,
            init_timestep=opts.init_timestep,
            rng=jax.random.PRNGKey(opts.seed),
        )
        images = np.asarray(images)[: len(ids)]
        prompts = prompts[: len(ids)]
        eval_images = _resize_uint8(images, opts.resolution)
        stats.append(np.asarray(opts.detector(eval_images)))
        if with_clip_score and opts.clip is not None:
            scores = np.asarray(opts.clip.score(eval_images, prompts))
            clip_sum += float(scores.sum())
            clip_count += len(scores)
        progress.update(min(start + opts.batch_size, len(my_ids)))
        if stats.is_full() and pc == 1:
            break
    stats.merge_across_processes()
    if with_clip_score and opts.clip is not None and pc > 1:
        from jax.experimental import multihost_utils as mhu

        arr = np.asarray(mhu.process_allgather(np.asarray([clip_sum, clip_count])))
        clip_sum, clip_count = float(arr.sum(0)[0]), float(arr.sum(0)[1])
    clip_score = clip_sum / clip_count if clip_count else None
    return stats, clip_score
