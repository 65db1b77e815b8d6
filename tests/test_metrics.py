"""Metric tests: PSNR closed-form, SSIM vs an independent numpy sliding-window
implementation, illuminance correction least-squares property, KLD helpers."""
import jax.numpy as jnp
import numpy as np

from noisediff_tpu.ops import metrics


def test_psnr_closed_form():
    x = np.zeros((8, 8, 3), np.float32)
    y = np.full((8, 8, 3), 0.1, np.float32)
    # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20
    np.testing.assert_allclose(float(metrics.psnr(jnp.asarray(x), jnp.asarray(y))), 20.0, rtol=1e-5)


def _ssim_numpy(x, y, data_range=1.0, win=7):
    """Independent O(N*win^2) reference implementation of skimage SSIM."""
    h, w, c = x.shape
    vals = []
    n = win * win
    cov_norm = n / (n - 1)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    for ch in range(c):
        for i in range(h - win + 1):
            for j in range(w - win + 1):
                px = x[i : i + win, j : j + win, ch].astype(np.float64)
                py = y[i : i + win, j : j + win, ch].astype(np.float64)
                ux, uy = px.mean(), py.mean()
                vx = cov_norm * (np.mean(px * px) - ux * ux)
                vy = cov_norm * (np.mean(py * py) - uy * uy)
                vxy = cov_norm * (np.mean(px * py) - ux * uy)
                vals.append(
                    ((2 * ux * uy + c1) * (2 * vxy + c2))
                    / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
                )
    return float(np.mean(vals))


def test_ssim_matches_independent_impl():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (12, 14, 2)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
    got = float(metrics.ssim(jnp.asarray(x), jnp.asarray(y)))
    exp = _ssim_numpy(x, y)
    np.testing.assert_allclose(got, exp, rtol=1e-4)


def test_ssim_identity_is_one():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (16, 16, 4)).astype(np.float32)
    assert float(metrics.ssim(jnp.asarray(x), jnp.asarray(x))) > 0.9999


def test_ssim_matlab_identity_and_range():
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 255, (20, 20)).astype(np.float32)
    assert float(metrics.ssim_matlab(jnp.asarray(x), jnp.asarray(x), 255.0)) > 0.9999
    y = rng.uniform(0, 255, (20, 20)).astype(np.float32)
    v = float(metrics.ssim_matlab(jnp.asarray(x), jnp.asarray(y), 255.0))
    assert -1.0 <= v < 0.5


def test_quality_assess_dict():
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (16, 16, 4)).astype(np.float32)
    res = metrics.quality_assess(x, x, data_range=1.0)
    assert set(res) == {"PSNR", "SSIM"}
    assert res["SSIM"] > 0.9999


def test_illuminance_correct_least_squares():
    """After correction, <pred', source> / <pred', pred'> == 1 over the mask —
    the optimal scalar scale (test_denoising.py:250-263)."""
    rng = np.random.default_rng(4)
    src = rng.uniform(0.1, 0.9, (1, 8, 8, 4)).astype(np.float32)
    pred = np.clip(src * 1.7, 0, 1).astype(np.float32)
    out = np.asarray(metrics.illuminance_correct(jnp.asarray(pred), jnp.asarray(src)))
    p = np.clip(pred, 0, 1).reshape(-1)
    scale = np.dot(p, src.reshape(-1)) / np.dot(p, p)
    np.testing.assert_allclose(out, scale * np.clip(pred, 0, 1), rtol=1e-5)
    # saturated pixels (==1) are excluded from the fit
    src2 = src.copy()
    src2[0, 0, 0, 0] = 1.0
    out2 = np.asarray(metrics.illuminance_correct(jnp.asarray(pred), jnp.asarray(src2)))
    mask = (src2 != 1).reshape(-1)
    num = np.dot(p[mask], src2.reshape(-1)[mask])
    den = np.dot(p[mask], p[mask])
    np.testing.assert_allclose(out2, num / den * np.clip(pred, 0, 1), rtol=1e-5)


def test_kld_helpers():
    p = np.array([0.5, 0.5, 0.0])
    q = np.array([0.25, 0.75, 0.0])
    fwd = metrics.kl_div_forward(p, q)
    exp = 0.5 * np.log(2) + 0.5 * np.log(0.5 / 0.75)
    np.testing.assert_allclose(fwd, exp, rtol=1e-6)
    inv = metrics.kl_div_inverse(p, q)
    f2, i2, s2 = metrics.kl_div_3(p, q)
    np.testing.assert_allclose([f2, i2, s2], [fwd, inv, (fwd + inv) / 2], rtol=1e-6)


def test_noise_kld_identical_distributions():
    rng = np.random.default_rng(5)
    a = rng.normal(0, 0.02, 200000)
    b = rng.normal(0, 0.02, 200000)
    fwd, inv, sym = metrics.noise_kld(a, b)
    assert sym < 0.01
    c = rng.normal(0, 0.06, 200000)
    _, _, sym2 = metrics.noise_kld(a, c)
    assert sym2 > sym * 5


def test_histogram_normalised():
    data = np.random.default_rng(6).uniform(0, 1, 10000)
    hist, centers = metrics.get_histogram(data, n_bins=100)
    np.testing.assert_allclose(hist.sum(), 1.0, rtol=1e-6)
    assert len(centers) == 100
