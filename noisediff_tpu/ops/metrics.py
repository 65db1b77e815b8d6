"""Quality metrics: PSNR, SSIM (skimage- and MATLAB-equivalent), KLD
noise-realism histograms, and illuminance correction.

Parity targets:
  quality_assess           test_denoising.py:220-229 (skimage PSNR +
                           SSIM(channel_axis=2) — uniform 7x7 window)
  MATLAB PSNR/SSIM         utils/calculate_PSNR_SSIM.py:38-90 (11x11 gaussian
                           window, sigma 1.5)
  KLD histogram protocol   utils/util.py:188-227 (noise_flow-derived)
  IlluminanceCorrect       test_denoising.py:232-263 (least-squares scale over
                           source != 1 pixels)

PSNR/SSIM are pure jnp so full-frame eval runs on-device; the KLD helpers are
numpy (they run on histogram vectors at the end of a generation job).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# PSNR
# ---------------------------------------------------------------------------

def psnr(estimate: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0):
    """Peak SNR, matching skimage.peak_signal_noise_ratio."""
    err = jnp.mean(
        (estimate.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    )
    return 10.0 * jnp.log10((data_range ** 2) / err)


# ---------------------------------------------------------------------------
# SSIM
# ---------------------------------------------------------------------------

def _depthwise_valid(x4: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    c = x4.shape[-1]
    k = jnp.tile(k, (1, 1, 1, c))  # HWIO with I=1, O=C, grouped
    return jax.lax.conv_general_dilated(
        x4, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _filter_valid(x: jnp.ndarray, kernel2d: jnp.ndarray) -> jnp.ndarray:
    """'valid' 2-D filter applied per channel of (H, W, C)."""
    c = x.shape[-1]
    k = kernel2d[:, :, None, None].astype(x.dtype)
    return _depthwise_valid(x[None], k)[0]


def ssim(
    estimate: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
):
    """skimage structural_similarity equivalent for float (H, W, C) images:
    uniform win_size window, unbiased covariance (N/(N-1)), mean over the
    valid (border-cropped) region, averaged over channels."""
    x = estimate.astype(jnp.float32)
    y = target.astype(jnp.float32)
    kernel = jnp.ones((win_size, win_size), jnp.float32) / (win_size * win_size)

    ux = _filter_valid(x, kernel)
    uy = _filter_valid(y, kernel)
    uxx = _filter_valid(x * x, kernel)
    uyy = _filter_valid(y * y, kernel)
    uxy = _filter_valid(x * y, kernel)

    n = win_size * win_size
    cov_norm = n / (n - 1)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)
    )
    return s.mean()


def psnr_matlab(img1: np.ndarray, img2: np.ndarray) -> float:
    """MATLAB-protocol PSNR over [0, 255] images with inf on identical
    inputs (utils/calculate_PSNR_SSIM.py:38-47)."""
    a = np.asarray(img1, np.float64)
    b = np.asarray(img2, np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0 / np.sqrt(mse))


def bgr2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    """BGR->YCbCr with the ITU-R BT.601 MATLAB coefficients
    (utils/calculate_PSNR_SSIM.py:93-114): uint8 in [0,255] or float in
    [0,1], output in the input's type/range."""
    in_type = img.dtype
    x = img.astype(np.float32)
    if in_type != np.uint8:
        x = x * 255.0
    if only_y:
        out = x @ np.array([24.966, 128.553, 65.481], np.float32) / 255.0 + 16.0
    else:
        out = x @ np.array(
            [[24.966, 112.0, -18.214],
             [128.553, -74.203, -93.786],
             [65.481, -37.797, 112.0]], np.float32,
        ) / 255.0 + np.array([16, 128, 128], np.float32)
    if in_type == np.uint8:
        out = out.round()
    else:
        out = out / 255.0
    return out.astype(in_type)


def tensor2img(arr: np.ndarray, out_type=np.uint8, min_max=(0.0, 1.0)) -> np.ndarray:
    """CHW (or BCHW grid / HW) array -> HWC image like the reference's
    tensor2img (utils/calculate_PSNR_SSIM.py:13-35): clamp to min_max,
    rescale to [0,1], RGB->BGR channel flip, optional uint8 rounding.
    4-D inputs are tiled like torchvision make_grid(nrow=int(sqrt(n)),
    padding=0) — the reference's exact call (:25): nrow images per row,
    no borders."""
    x = np.asarray(arr, np.float32)
    x = np.squeeze(x)
    x = np.clip(x, *min_max)
    x = (x - min_max[0]) / (min_max[1] - min_max[0])
    if x.ndim == 4:  # (B, C, H, W) -> make_grid(nrow=int(sqrt(n)), padding=0)
        n, c, h, w = x.shape
        xmaps = max(min(int(np.sqrt(n)), n), 1)  # images per row
        ymaps = int(np.ceil(n / xmaps))
        grid = np.zeros((c, ymaps * h, xmaps * w), np.float32)
        for i in range(n):
            r, col = divmod(i, xmaps)
            grid[:, r * h : r * h + h, col * w : col * w + w] = x[i]
        x = grid
    if x.ndim == 3:
        x = np.transpose(x[[2, 1, 0], :, :], (1, 2, 0))  # CHW RGB -> HWC BGR
    if out_type == np.uint8:
        x = (x * 255.0).round()
    return x.astype(out_type)


def tensor2im(arr, visualize: bool = False, video: bool = False) -> np.ndarray:
    """BCHW array -> HWC (or BHWC when video=True) float image scaled to
    [0, 255], like the reference's tensor2im (utils/metric_util.py:9-24):
    visualize keeps only the first 3 channels; video keeps the batch axis;
    otherwise image 0 is taken. Values are clipped to [0, 255]."""
    x = np.asarray(arr, np.float32)
    if visualize:
        x = x[:, 0:3, ...]
    if not video:
        out = np.transpose(x[0], (1, 2, 0)) * 255.0
    else:
        out = np.transpose(x, (0, 2, 3, 1)) * 255.0
    return np.clip(out, 0, 255)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    half = size // 2
    coords = jnp.arange(-half, half + 1, dtype=jnp.float32)
    g = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim_matlab(
    estimate: jnp.ndarray, target: jnp.ndarray, data_range: float = 255.0
):
    """MATLAB-protocol SSIM (utils/calculate_PSNR_SSIM.py:61-90): 11x11
    gaussian window sigma=1.5, biased (population) covariance, valid region."""
    x = estimate.astype(jnp.float32)
    y = target.astype(jnp.float32)
    if x.ndim == 2:
        x = x[..., None]
        y = y[..., None]
    kernel = _gaussian_kernel(11, 1.5)

    mu1 = _filter_valid(x, kernel)
    mu2 = _filter_valid(y, kernel)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter_valid(x * x, kernel) - mu1_sq
    sigma2_sq = _filter_valid(y * y, kernel) - mu2_sq
    sigma12 = _filter_valid(x * y, kernel) - mu12

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return s.mean()


def quality_assess(
    estimate: np.ndarray, target: np.ndarray, data_range: float = 1.0
) -> Dict[str, float]:
    """PSNR + SSIM dict for an (H, W, C) pair (test_denoising.py:220-229;
    argument order there is (X=estimate, Y=correct))."""
    if estimate.ndim != 3:
        raise NotImplementedError("quality_assess expects (H, W, C) images")
    return {
        "PSNR": float(psnr(jnp.asarray(estimate), jnp.asarray(target), data_range)),
        "SSIM": float(ssim(jnp.asarray(estimate), jnp.asarray(target), data_range)),
    }


# ---------------------------------------------------------------------------
# Illuminance correction (test_denoising.py:232-263)
# ---------------------------------------------------------------------------

def illuminance_correct(predict: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
    """Least-squares brightness alignment: scale = <p,s>/<p,p> over pixels
    where source != 1 (saturated pixels excluded), applied to the clamped
    prediction. Works on (H, W, C) or batched (B, H, W, C) inputs."""

    def correct_one(pred, src):
        pred = jnp.clip(pred, 0.0, 1.0)
        mask = (src != 1.0).astype(jnp.float32)
        num = jnp.sum(pred * src * mask)
        den = jnp.sum(pred * pred * mask)
        return num / den * pred

    if predict.ndim == 4:
        if source.shape[0] == 1 and predict.shape[0] != 1:
            source = jnp.broadcast_to(source, predict.shape)
        return jax.vmap(correct_one)(predict, source)
    return correct_one(predict, source)


# ---------------------------------------------------------------------------
# KLD noise-realism protocol (utils/util.py:188-227)
# ---------------------------------------------------------------------------

def get_histogram(
    data: np.ndarray,
    bin_edges: np.ndarray | None = None,
    left_edge: float = 0.0,
    right_edge: float = 1.0,
    n_bins: int = 1000,
) -> Tuple[np.ndarray, np.ndarray]:
    data_range = right_edge - left_edge
    bin_width = data_range / n_bins
    if bin_edges is None:
        bin_edges = np.arange(left_edge, right_edge + bin_width, bin_width)
    bin_centers = bin_edges[:-1] + bin_width / 2.0
    n = np.prod(data.shape)
    hist, _ = np.histogram(data, bin_edges)
    return hist / n, bin_centers


def _valid_pq(p, q):
    idx = ~(np.isnan(p) | np.isinf(p) | np.isnan(q) | np.isinf(q))
    p, q = p[idx], q[idx]
    idx = (p > 0) & (q > 0)
    return p[idx], q[idx]


def kl_div_forward(p: np.ndarray, q: np.ndarray) -> float:
    p, q = _valid_pq(p, q)
    return float(np.sum(p * np.log(p / q)))


def kl_div_inverse(p: np.ndarray, q: np.ndarray) -> float:
    p, q = _valid_pq(p, q)
    return float(np.sum(q * np.log(q / p)))


def kl_div_3(p: np.ndarray, q: np.ndarray) -> Tuple[float, float, float]:
    fwd = kl_div_forward(p, q)
    inv = kl_div_inverse(p, q)
    return fwd, inv, (fwd + inv) / 2.0


def noise_kld(
    real_noise: np.ndarray, synth_noise: np.ndarray, n_bins: int = 1000,
    left_edge: float = -0.1, right_edge: float = 0.1,
) -> Tuple[float, float, float]:
    """Forward/inverse/symmetric KLD between real and synthetic noise
    histograms over a shared binning (the reference's eval protocol)."""
    edges = np.linspace(left_edge, right_edge, n_bins + 1)
    edges = np.concatenate([[-1000.0], edges, [1000.0]])
    p, _ = get_histogram(real_noise, bin_edges=edges)
    q, _ = get_histogram(synth_noise, bin_edges=edges)
    return kl_div_3(p, q)
