"""HPSv2 as a registered metric.

The reference registers an ``hpsv2`` metric that is dead code (name-shadow
recursion at ``sid_metric_main.py:123-124``; its ``metrics/sid_hpsv2.py``
helper has missing imports — SURVEY.md §2.5).  This is the working version:
generate over the HPSv2 benchmark prompts (package if installed, else
``opts.hpsv2_prompts`` — a ``{style: [prompts]}`` dict or json path) and
score with ``hpsv2`` or the bundled CLIP scorer (HPSv2 weights via
``SIDLSG_CLIP_WEIGHTS``).

Aggregation contract (pinned by ``tests/test_metrics.py::
test_hpsv2_aggregation_semantics``): the hpsv2 package's ``evaluate``
scores each style benchmark independently and reports one mean per style
(hpsv2/evaluation.py accumulates ``score[style]`` and prints each style's
mean separately); the single summary number quoted alongside (and in the
reference paper's Table 4, one column per style plus an average) is the
UNWEIGHTED average of the four style means — NOT the mean over all pooled
images.  ``hpsv2_mean`` follows that: mean over per-style means, so styles
with unequal prompt counts (possible under the ``num_gen`` cap) still
contribute equally.  ``num_gen // n_styles`` caps generation per style; the
package itself scores the full 800-prompt benchmark per style — on weights
day run with ``num_gen >= 3200`` for the published protocol.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from ..diffusion.rng import StackedRandomGenerator
from .registry import MetricOptions, register_metric


def _benchmark_prompts(opts: MetricOptions) -> Dict[str, List[str]]:
    try:
        import hpsv2 as hps  # type: ignore

        return hps.benchmark_prompts("all")
    except ImportError:
        pass
    src = getattr(opts, "hpsv2_prompts", None)
    if isinstance(src, dict):
        return src
    if isinstance(src, str) and os.path.exists(src):
        with open(src, encoding="utf-8") as f:
            return json.load(f)
    raise RuntimeError(
        "hpsv2 package not installed; set opts.hpsv2_prompts to a "
        "{style: [prompts]} dict or json path"
    )


@register_metric
def hpsv2(opts: MetricOptions):
    import jax

    if opts.clip is None:
        from .detectors import clip_scorer

        opts.clip = clip_scorer()
    all_prompts = _benchmark_prompts(opts)
    per_style = max(opts.num_gen // max(len(all_prompts), 1), 1)
    latent_size = opts.pipe.config.unet.sample_size
    results = {}
    for style, prompts in all_prompts.items():
        prompts = prompts[:per_style]
        scores: List[float] = []
        for start in range(0, len(prompts), opts.batch_size):
            chunk = prompts[start : start + opts.batch_size]
            pad = opts.batch_size - len(chunk)
            padded = chunk + chunk[:1] * pad
            seeds = list(range(start, start + len(padded)))
            latents = StackedRandomGenerator(seeds).randn(
                (len(padded), latent_size, latent_size, 4)
            )
            images = opts.pipe.generate(
                padded, latents, num_steps=opts.num_steps_eval,
                init_timestep=opts.init_timestep, rng=jax.random.PRNGKey(opts.seed),
            )
            s = np.asarray(opts.clip.score(np.asarray(images), padded))
            scores.extend(s[: len(chunk)].tolist())
        results[f"hpsv2_{style.replace('-', '_')}"] = float(np.mean(scores))
    results["hpsv2_mean"] = float(np.mean(list(results.values())))
    return results
