"""Base utilities (parity: src/utils/base_utils.py — perf_timer :11-59
lives in utils/profiling.py; here the pickle I/O :62-71, ``project``
:73 and ``load_object`` :139-144 helpers)."""

from __future__ import annotations

import importlib
import os
import pickle

import numpy as np

from .profiling import perf_timer  # noqa: F401 (re-export, reference layout)


def save_pickle(data, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(data, f)


def read_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def project(xyz: np.ndarray, K: np.ndarray, RT: np.ndarray) -> np.ndarray:
    """World points (N, 3) -> pixel coords (N, 2) through K [R|t]
    (reference base_utils.py:73)."""
    cam = xyz @ RT[:3, :3].T + RT[:3, 3]
    pix = cam @ K.T
    return pix[..., :2] / pix[..., 2:]


def load_object(dotted: str, kwargs: dict | None = None):
    """Instantiate ``pkg.module.Class`` by dotted path (reference
    base_utils.py:139-144)."""
    module_name, cls_name = dotted.rsplit(".", 1)
    module = importlib.import_module(module_name)
    return getattr(module, cls_name)(**(kwargs or {}))
