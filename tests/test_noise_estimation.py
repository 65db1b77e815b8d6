"""Noise-estimation tests: window stats vs brute-force unfold, regression
recovery of known Poisson-Gaussian parameters, KL parity with torch."""
import jax.numpy as jnp
import numpy as np
import pytest

from noisediff_tpu.ops import noise_estimation as ne


def _unfold_stats_bruteforce(x, k=3):
    """Reference-semantics check: zero-padded k x k windows, unbiased std."""
    b, h, w, c = x.shape
    pad = k // 2
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    stds = np.zeros((b, h * w, c))
    means = np.zeros((b, h * w, c))
    for bi in range(b):
        for ci in range(c):
            idx = 0
            for i in range(h):
                for j in range(w):
                    win = xp[bi, i : i + k, j : j + k, ci].reshape(-1)
                    means[bi, idx, ci] = win.mean()
                    stds[bi, idx, ci] = win.std(ddof=1)
                    idx += 1
    return stds, means


def test_sliding_window_stats_match_unfold():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 6, 7, 2)).astype(np.float32)
    std, mean = ne.sliding_window_stats(jnp.asarray(x))
    std_b, mean_b = _unfold_stats_bruteforce(x)
    np.testing.assert_allclose(np.asarray(mean), mean_b, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(std), std_b, rtol=1e-3, atol=1e-5)


def test_patch_regression_recovers_poisson_slope():
    """Poisson-ish noise: std = sqrt(k * mu) is NOT linear, so use a synthetic
    exactly-linear std(mu) field to validate the OLS machinery."""
    rng = np.random.default_rng(1)
    h = w = 64
    mu = rng.uniform(0.1, 1.0, (1, h, w, 1)).astype(np.float32)
    # windows of constant mu with additive noise of std = 0.5*mu + 0.01
    x = mu + rng.normal(0, 1, mu.shape).astype(np.float32) * (0.5 * mu + 0.01)
    slope, intercept = ne.compute_poisson_lambda_by_patch(jnp.asarray(x))
    assert slope.shape == (1, 1)
    assert 0.2 < slope[0, 0] < 0.8  # noisy estimate, right ballpark


def test_theil_sen_robust():
    x = np.linspace(0, 1, 50)
    y = 2.0 * x + 0.1
    y[::10] += 5.0  # outliers
    slope, intercept = ne.theil_sen(x, y)
    assert abs(slope - 2.0) < 0.2
    assert abs(intercept - 0.1) < 0.2


def test_kl_divergence_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    a = rng.normal(size=(4, 5)).astype(np.float32)
    b = rng.normal(size=(4, 5)).astype(np.float32)
    got = float(ne.kl_divergence(jnp.asarray(a), jnp.asarray(b)))
    tin = F.log_softmax(torch.from_numpy(a).view(-1), dim=0)
    ttg = F.softmax(torch.from_numpy(b).view(-1), dim=0)
    exp = float(torch.nn.KLDivLoss(reduction="mean")(tin, ttg))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-7)


def test_value_based_lambda():
    rng = np.random.default_rng(3)
    # quantised clean values, noisy std proportional to value
    clean = rng.choice([0.1, 0.2, 0.3, 0.4], size=(64, 64)).astype(np.float32)
    noisy = clean + rng.normal(0, 1, clean.shape).astype(np.float32) * (0.5 * clean)
    slope, intercept = ne.get_poisson_lambda(clean, noisy)
    assert 0.3 < slope < 0.7


def test_accumulate_and_regress():
    rng = np.random.default_rng(4)
    acc = {}
    for _ in range(3):
        clean = rng.choice([0.1, 0.2, 0.3], size=(32, 32)).astype(np.float32)
        noisy = clean + rng.normal(0, 1, clean.shape).astype(np.float32) * (0.4 * clean)
        acc = ne.accumulate_value_stats(clean, noisy, acc)
    slope, _ = ne.regress_value_stats(acc)
    assert 0.25 < slope < 0.55
