from .ray_ops import (
    composite,
    compute_weights,
    get_rays,
    ray_aabb_intersect,
    sample_pdf,
    stratified_sample,
)

__all__ = [
    "composite", "compute_weights", "get_rays", "ray_aabb_intersect",
    "sample_pdf", "stratified_sample",
]
