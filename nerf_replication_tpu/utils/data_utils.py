"""Data / geometry utilities.

Capability parity with the NeRF-relevant pieces of
src/utils/data_utils.py (616 LoC, mostly legacy CV augmentation):
``to_device`` (the load-bearing ``to_cuda`` :557-575), ``get_near_far``
AABB intersection (:601), ``load_K_Rt_from_P`` projection decomposition
(:577), plus camera helpers used across the framework.
"""

from __future__ import annotations

import numpy as np

from ..ops.ray_ops import ray_aabb_intersect
from ..train.trainers.trainer import host_batch_to_device as to_device  # noqa: F401

to_cuda = to_device  # reference-name alias


def get_near_far(bounds: np.ndarray, ray_o, ray_d, near_default=2.0,
                 far_default=6.0):
    """Per-ray near/far from an AABB ``bounds`` (2, 3) (reference
    data_utils.py:601)."""
    near, far, hit = ray_aabb_intersect(
        ray_o, ray_d, bounds[0], bounds[1], near_default, far_default)
    return near, far, hit


def load_K_Rt_from_P(P: np.ndarray):
    """Decompose a 3x4 projection into intrinsics K and pose [R|t]
    (reference data_utils.py:577) via RQ decomposition."""
    P = np.asarray(P, dtype=np.float64)[:3, :4]
    M = P[:, :3]
    # RQ decomposition via QR of the flipped matrix
    flip = np.flipud(np.eye(3))
    q, r = np.linalg.qr((flip @ M).T)
    K = flip @ r.T @ flip
    R = flip @ q.T
    # fix signs so K has positive diagonal
    signs = np.sign(np.diag(K))
    K = K * signs[None, :]
    R = R * signs[:, None]
    if np.linalg.det(R) < 0:
        R = -R
        K = -K
    t = np.linalg.solve(K, P[:, 3])
    K = K / K[2, 2]

    pose = np.eye(4)
    pose[:3, :3] = R.T
    pose[:3, 3] = -R.T @ t
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K
    return intrinsics.astype(np.float32), pose.astype(np.float32)
