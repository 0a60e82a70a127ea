"""img_fit task wrapper.

The reference config points at ``src.train.losses.img_fit``, a module
that does not exist in its tree (SURVEY.md §2.4) — this implements the
missing loss wrapper: MSE on rgb + PSNR stat, same
``(output, loss, loss_stats, image_stats)`` contract.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...registry import register
from .nerf import psnr_from_mse


class NetworkWrapper:
    def __init__(self, net, cfg, train_loader=None):
        self.net = net
        self.cfg = cfg

    def loss_fn(self, params, batch, key=None, train: bool = True):
        out = self.net.apply(params, batch)
        mse = jnp.mean((out["rgb"] - batch["rgb"]) ** 2)
        loss_stats = {"loss": mse, "color_mse": mse, "psnr": psnr_from_mse(mse)}
        return mse, (out, loss_stats, {})

    def __call__(self, params, batch, key=None, train: bool = True):
        loss, (output, loss_stats, image_stats) = self.loss_fn(
            params, batch, key, train)
        return output, loss, loss_stats, image_stats

    def render_eval(self, params, batch):
        return self.net.apply(params, batch)


@register("loss", "img_fit", aliases=(
    "src.train.trainers.img_fit", "src.train.losses.img_fit",
    "nerf_replication_tpu.train.trainers.img_fit"))
def _make_img_fit_wrapper(cfg, network=None, train_loader=None):
    return NetworkWrapper(network, cfg, train_loader)
