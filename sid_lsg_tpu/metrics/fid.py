"""Fréchet distance between feature Gaussians.

Math of reference ``metrics/sid_fid_and_clip.py:60-69``:
``FID = |mu_g - mu_r|^2 + tr(C_g + C_r - 2 (C_g C_r)^{1/2})``.
The matrix square root runs on host in float64 — ``scipy.linalg.sqrtm`` when
available, else a Newton–Schulz iteration (both validated against each other
in tests).  Everything upstream (features, mean/cov) streams on device.
"""

from __future__ import annotations

import numpy as np


def _sqrtm_newton_schulz(a: np.ndarray, iters: int = 50) -> np.ndarray:
    """Stable Newton–Schulz sqrt of a PSD matrix (float64 host math)."""
    norm = np.linalg.norm(a)
    if norm == 0:
        return np.zeros_like(a)
    y = a / norm
    z = np.eye(a.shape[0], dtype=a.dtype)
    eye3 = 3.0 * np.eye(a.shape[0], dtype=a.dtype)
    for _ in range(iters):
        t = 0.5 * (eye3 - z @ y)
        y = y @ t
        z = t @ z
    return y * np.sqrt(norm)


def sqrtm_product_trace(cov_a: np.ndarray, cov_b: np.ndarray) -> float:
    """tr((cov_a cov_b)^{1/2}), real part."""
    prod = cov_a.astype(np.float64) @ cov_b.astype(np.float64)
    try:
        import scipy.linalg

        s = scipy.linalg.sqrtm(prod)
        if isinstance(s, tuple):
            s = s[0]
        return float(np.real(np.trace(s)))
    except ImportError:
        # Newton–Schulz needs a symmetric PSD input: use the similarity
        # transform tr((A B)^1/2) = tr((A^1/2 B A^1/2)^1/2).
        ra = _sqrtm_newton_schulz(cov_a.astype(np.float64))
        sym = ra @ cov_b.astype(np.float64) @ ra
        sym = 0.5 * (sym + sym.T)
        return float(np.trace(_sqrtm_newton_schulz(sym)))


def frechet_distance(mu_a, cov_a, mu_b, cov_b) -> float:
    mu_a = np.asarray(mu_a, np.float64)
    mu_b = np.asarray(mu_b, np.float64)
    m = float(np.square(mu_a - mu_b).sum())
    tr_ab = sqrtm_product_trace(np.asarray(cov_a), np.asarray(cov_b))
    return float(m + np.trace(cov_a) + np.trace(cov_b) - 2.0 * tr_ab)


def compute_fid_from_stats(stats_gen, stats_real) -> float:
    mu_g, cov_g = stats_gen.get_mean_cov()
    mu_r, cov_r = stats_real.get_mean_cov()
    return frechet_distance(mu_g, cov_g, mu_r, cov_r)
