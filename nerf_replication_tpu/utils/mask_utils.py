"""Mask utilities (parity: src/utils/mask_utils.py, 323 LoC of mask
ops for the parent framework's segmentation-style tasks)."""

from __future__ import annotations

import numpy as np


def mask_to_bbox(mask: np.ndarray):
    """Tight (x0, y0, x1, y1) bbox of a boolean mask; None if empty."""
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return None
    return int(xs.min()), int(ys.min()), int(xs.max()) + 1, int(ys.max()) + 1


def bbox_to_mask(bbox, H: int, W: int) -> np.ndarray:
    m = np.zeros((H, W), dtype=bool)
    x0, y0, x1, y1 = bbox
    m[max(y0, 0):min(y1, H), max(x0, 0):min(x1, W)] = True
    return m


def dilate(mask: np.ndarray, iterations: int = 1) -> np.ndarray:
    m = mask.astype(bool)
    for _ in range(iterations):
        grown = m.copy()
        grown[1:] |= m[:-1]
        grown[:-1] |= m[1:]
        grown[:, 1:] |= m[:, :-1]
        grown[:, :-1] |= m[:, 1:]
        m = grown
    return m


def erode(mask: np.ndarray, iterations: int = 1) -> np.ndarray:
    return ~dilate(~mask.astype(bool), iterations)


def alpha_to_mask(alpha: np.ndarray, threshold: float = 0.5) -> np.ndarray:
    return np.asarray(alpha) > threshold


def crop_by_mask(img: np.ndarray, mask: np.ndarray, pad: int = 0):
    bbox = mask_to_bbox(mask)
    if bbox is None:
        return img
    x0, y0, x1, y1 = bbox
    H, W = mask.shape
    return img[max(y0 - pad, 0):min(y1 + pad, H),
               max(x0 - pad, 0):min(x1 + pad, W)]
