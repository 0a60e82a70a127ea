"""Image metrics: PSNR (uint8-quantized) and SSIM.

skimage is not available in this environment, so SSIM is implemented from
scratch to match ``skimage.metrics.structural_similarity`` defaults
(uniform 7x7 window, K1=0.01/K2=0.03, unbiased covariance, valid-region
crop) so numbers are comparable with the reference evaluator
(src/evaluators/nerf.py:69-78: win_size=7, channel_axis=2, uint8 inputs).

PSNR follows the reference's uint8-quantized definition
(nerf.py:23-30) with one quirk fix: the reference squares the difference
of *uint8* arrays, which wraps modulo 256 and corrupts the MSE; we cast
to float after quantization (the intended metric).
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import uniform_filter


def psnr_uint8(img_pred: np.ndarray, img_gt: np.ndarray) -> float:
    """PSNR on uint8-quantized [0,1] images (reference nerf.py:23-30)."""
    p = (np.clip(img_pred, 0, 1) * 255).astype(np.uint8).astype(np.float64)
    g = (np.clip(img_gt, 0, 1) * 255).astype(np.uint8).astype(np.float64)
    mse = np.mean((p - g) ** 2)
    if mse < 1e-10:
        return 100.0
    return float(10.0 * np.log10(255.0**2 / mse))


def psnr(img_pred: np.ndarray, img_gt: np.ndarray, data_range: float = 1.0) -> float:
    """Float PSNR (skimage.peak_signal_noise_ratio semantics)."""
    mse = np.mean((np.asarray(img_pred, np.float64) -
                   np.asarray(img_gt, np.float64)) ** 2)
    if mse < 1e-12:
        return 100.0
    return float(10.0 * np.log10(data_range**2 / mse))


def _ssim_single(x: np.ndarray, y: np.ndarray, win_size: int,
                 data_range: float, full: bool):
    """SSIM for one 2-D channel; skimage-compatible (uniform window)."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    NP = win_size**2
    cov_norm = NP / (NP - 1.0)  # unbiased sample covariance
    filt = lambda im: uniform_filter(im, size=win_size)

    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux**2 + uy**2 + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)

    pad = (win_size - 1) // 2
    mean = S[pad:-pad, pad:-pad].mean() if pad > 0 else S.mean()
    return (mean, S) if full else (mean, None)


def ssim(img_pred: np.ndarray, img_gt: np.ndarray, win_size: int = 7,
         data_range: float | None = None, channel_axis: int | None = None,
         full: bool = False):
    """skimage.structural_similarity-compatible SSIM.

    uint8 inputs default data_range=255; float inputs require explicit
    data_range (we default to 1.0 for convenience).
    """
    img_pred = np.asarray(img_pred)
    img_gt = np.asarray(img_gt)
    if data_range is None:
        data_range = 255.0 if img_pred.dtype == np.uint8 else 1.0
    if channel_axis is not None:
        ch = img_pred.shape[channel_axis]
        vals, maps = [], []
        for c in range(ch):
            xs = np.take(img_pred, c, axis=channel_axis)
            ys = np.take(img_gt, c, axis=channel_axis)
            m, smap = _ssim_single(xs, ys, win_size, data_range, full)
            vals.append(m)
            if full:
                maps.append(smap)
        mean = float(np.mean(vals))
        if full:
            return mean, np.stack(maps, axis=channel_axis)
        return mean
    m, smap = _ssim_single(img_pred, img_gt, win_size, data_range, full)
    return (float(m), smap) if full else float(m)
