"""Renderer factory (parity: src/models/nerf/renderer/__init__.py:1)."""

from ....registry import register, resolve
from .volume_renderer import Renderer, RenderSettings, render_rays


@register(
    "renderer", "volume_renderer",
    aliases=("src.models.nerf.renderer.volume_renderer",
             "nerf_replication_tpu.models.nerf.renderer.volume_renderer"),
)
def _make_volume_renderer(cfg, network=None):
    return Renderer(network, cfg=cfg)


def make_renderer(cfg, network):
    return resolve("renderer", cfg.renderer_module)(cfg, network=network)


__all__ = ["make_renderer", "Renderer", "RenderSettings", "render_rays"]
