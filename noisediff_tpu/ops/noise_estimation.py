"""Noise-parameter estimation: sigma-vs-mu regression and KL divergence.

Parity target: reference `utils/raw_util.py:161-322`:
  sliding_window                       :161-166  3x3 unfold, pad 1
  compute_poisson_lambda_by_patch      :169-189  per-(B,C) OLS of std vs mean
  compute_poisson_lambda_by_patch_single_image :214-232 Theil-Sen variant
  kl_divergence                        :237-244  softmax KLDivLoss
  get_poisson_lambda (value-based)     :248-280
  get_poisson_lambda_all_images        :284-322

Window statistics run on-device (jnp); the regressions are host-side numpy /
scipy (tiny inputs, and Theil-Sen is inherently sequential).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sliding_window_stats(
    x: jnp.ndarray, kernel_size: int = 3
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-window (std, mean) over kernel_size^2 neighbourhoods, same-size
    output via zero padding (matching F.unfold(padding=1) semantics).

    x: (B, H, W, C) -> std, mean each (B, H*W, C). Uses box-filter sums
    instead of materialising the (B, C, k*k, N) patch tensor the reference
    builds — O(HW) memory instead of O(k^2 HW).
    """
    b, h, w, c = x.shape
    k = kernel_size
    pad = k // 2
    ones = jnp.ones((b, h, w, 1), x.dtype)

    def box(v):
        kern = jnp.ones((k, k, 1, 1), x.dtype)
        vc = v.shape[-1]
        return jax.lax.conv_general_dilated(
            v, jnp.tile(kern, (1, 1, 1, vc)), (1, 1),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=vc,
        )

    count = box(ones)  # zero-padded windows have < k*k valid... but unfold
    # counts zeros as values: the reference's F.unfold pads with literal
    # zeros, so the window population is always k*k including the pad zeros.
    n = float(k * k)
    s1 = box(x)
    s2 = box(x * x)
    mean = s1 / n
    # torch.std_mean uses the unbiased (n-1) estimator
    var = jnp.maximum((s2 - n * mean * mean) / (n - 1.0), 0.0)
    std = jnp.sqrt(var)
    del count
    return std.reshape(b, h * w, c), mean.reshape(b, h * w, c)


def compute_poisson_lambda_by_patch(x: jnp.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """OLS slope/intercept of std-vs-mean per (batch, channel).

    x: (B, H, W, C); returns (lambda, intercept) arrays of shape (B, C)
    (raw_util.py:169-189, which loops an sklearn LinearRegression per row —
    here one vectorised closed form)."""
    std, mean = sliding_window_stats(x)
    std = np.asarray(std, np.float64)
    mean = np.asarray(mean, np.float64)
    mx = mean.mean(axis=1)  # (B, C)
    my = std.mean(axis=1)
    cov = ((mean - mx[:, None]) * (std - my[:, None])).sum(axis=1)
    var = ((mean - mx[:, None]) ** 2).sum(axis=1)
    slope = cov / np.where(var == 0, 1.0, var)
    intercept = my - slope * mx
    return slope, intercept


def theil_sen(x: np.ndarray, y: np.ndarray) -> Tuple[float, float]:
    """Robust slope/intercept (scipy.stats.theilslopes)."""
    from scipy.stats import theilslopes

    slope, intercept, _, _ = theilslopes(y, x)
    return float(slope), float(intercept)


def compute_poisson_lambda_single_image(x: jnp.ndarray) -> Tuple[float, float]:
    """Theil-Sen std-vs-mean fit over all channels of one (H, W, C) image
    (raw_util.py:214-232). Large images are subsampled to keep the pairwise
    median tractable."""
    std, mean = sliding_window_stats(x[None])
    std = np.asarray(std, np.float64).reshape(-1)
    mean = np.asarray(mean, np.float64).reshape(-1)
    if len(std) > 20000:
        idx = np.random.default_rng(0).choice(len(std), 20000, replace=False)
        std, mean = std[idx], mean[idx]
    return theil_sen(mean, std)


def kl_divergence(input_arr: jnp.ndarray, target_arr: jnp.ndarray) -> jnp.ndarray:
    """Softmax-KL between two flattened arrays (raw_util.py:237-244):
    KLDivLoss(reduction='mean') over log_softmax(input), softmax(target)."""
    p_log = jax.nn.log_softmax(input_arr.reshape(-1).astype(jnp.float32))
    q = jax.nn.softmax(target_arr.reshape(-1).astype(jnp.float32))
    # torch KLDivLoss 'mean': mean over elements of q * (log q - p_log)
    safe_log_q = jnp.where(q > 0, jnp.log(jnp.maximum(q, 1e-38)), 0.0)
    return jnp.mean(q * (safe_log_q - p_log))


def get_poisson_lambda(
    clean: np.ndarray, noisy: np.ndarray, atol: float = 1e-6
) -> Tuple[float, float]:
    """Value-based estimate (raw_util.py:248-280): for each unique clean value
    at or below the median, the std of noisy at those positions; Theil-Sen of
    std vs value."""
    values = np.unique(clean)
    median = np.median(values)
    means, stds = [], []
    for v in values:
        if v <= median:
            pts = noisy[np.abs(clean - v) < atol]
            if len(pts) > 1:
                s = pts.std(ddof=1)
                if not np.isnan(s):
                    means.append(v)
                    stds.append(s)
    if not means:
        return 0.0, 0.0
    return theil_sen(np.asarray(means), np.asarray(stds))


def accumulate_value_stats(
    clean: np.ndarray, noisy: np.ndarray, acc: Dict[float, list], atol: float = 1e-6
) -> Dict[float, list]:
    """Multi-image accumulator (raw_util.py:284-300)."""
    for v in np.unique(clean):
        acc.setdefault(float(v), []).extend(noisy[np.abs(clean - v) < atol].tolist())
    return acc


def regress_value_stats(acc: Dict[float, list]) -> Tuple[float, float]:
    """Final Theil-Sen over the accumulated per-value stds (raw_util.py:303-322)."""
    means, stds = [], []
    for v, pts in acc.items():
        if len(pts) > 1:
            s = np.std(pts, ddof=1)
            if not np.isnan(s):
                means.append(v)
                stds.append(s)
    return theil_sen(np.asarray(means), np.asarray(stds))
