"""Evaluator factory (parity: src/evaluators/make_evaluator.py:12-16)."""

from ..registry import resolve
from . import img_fit, nerf  # noqa: F401 (registry side effects)
from .metrics import psnr, psnr_uint8, ssim


def make_evaluator(cfg):
    if cfg.get("skip_eval", False):
        return None
    return resolve("evaluator", cfg.evaluator_module)(cfg)


__all__ = ["make_evaluator", "psnr", "psnr_uint8", "ssim"]
