"""Image/visualization helpers (parity: src/utils/img_utils.py —
``horizon_concate`` :26 and ``visualize_depth_numpy`` :321 are the
NeRF-path-relevant pieces)."""

from __future__ import annotations

import numpy as np


def horizon_concate(img0: np.ndarray, img1: np.ndarray) -> np.ndarray:
    """Concatenate two images side by side, padding heights."""
    h = max(img0.shape[0], img1.shape[0])
    c = img0.shape[2] if img0.ndim == 3 else 1

    def pad(img):
        if img.ndim == 2:
            img = img[..., None].repeat(c, -1) if c > 1 else img[..., None]
        out = np.zeros((h, img.shape[1], img.shape[2]), img.dtype)
        out[: img.shape[0]] = img
        return out

    return np.concatenate([pad(img0), pad(img1)], axis=1)


def vertical_concate(img0: np.ndarray, img1: np.ndarray) -> np.ndarray:
    w = max(img0.shape[1], img1.shape[1])

    def pad(img):
        out = np.zeros((img.shape[0], w) + img.shape[2:], img.dtype)
        out[:, : img.shape[1]] = img
        return out

    return np.concatenate([pad(img0), pad(img1)], axis=0)


_TURBO_ANCHORS = np.array([
    [0.19, 0.07, 0.23], [0.27, 0.32, 0.84], [0.12, 0.64, 0.95],
    [0.16, 0.89, 0.54], [0.63, 0.97, 0.23], [0.96, 0.73, 0.16],
    [0.95, 0.36, 0.11], [0.70, 0.08, 0.09],
], dtype=np.float32)


def colorize(x: np.ndarray) -> np.ndarray:
    """Map [0,1] scalars through a turbo-like colormap -> (..., 3)."""
    x = np.clip(x, 0.0, 1.0) * (len(_TURBO_ANCHORS) - 1)
    i0 = np.clip(np.floor(x).astype(int), 0, len(_TURBO_ANCHORS) - 2)
    f = (x - i0)[..., None]
    return (1 - f) * _TURBO_ANCHORS[i0] + f * _TURBO_ANCHORS[i0 + 1]


def visualize_depth_numpy(depth: np.ndarray, near_far=None) -> np.ndarray:
    """Depth map -> uint8 color visualization (reference
    img_utils.py:321 capability)."""
    d = np.asarray(depth, np.float32)
    if near_far is None:
        lo, hi = np.percentile(d[np.isfinite(d)], [2, 98])
    else:
        lo, hi = near_far
    x = (d - lo) / max(hi - lo, 1e-8)
    return (colorize(x) * 255).astype(np.uint8)
