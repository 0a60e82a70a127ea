"""Datasets package (parity: src/datasets/__init__.py:1 exports
``make_data_loader``)."""

# import for registry side effects
from . import img_fit, nerf  # noqa: F401
from .make_dataset import DataLoader, make_data_loader, make_dataset
from .pipeline import DeviceRayPipeline, rays_for_camera

__all__ = [
    "make_data_loader", "make_dataset", "DataLoader",
    "DeviceRayPipeline", "rays_for_camera",
]
