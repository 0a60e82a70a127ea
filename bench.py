#!/usr/bin/env python
"""Benchmark: 800x800 hierarchical render fps on the flagship lego-config
NeRF (64+128 samples, coarse+fine 8x256 MLP), run on real TPU.

Prints ONE JSON line:
  {"metric": "render_fps_800x800", "value": N, "unit": "fps",
   "vs_baseline": N / 5.0}
(baseline: the BASELINE.md north-star target of 5 fps at 800x800).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_replication_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _flagship
    from nerf_replication_tpu.datasets.pipeline import rays_for_camera
    from nerf_replication_tpu.models.nerf.renderer.volume_renderer import (
        render_rays,
    )
    from nerf_replication_tpu.utils.synthetic_scene import look_at_pose

    H = W = int(os.environ.get("BENCH_SIZE", "800"))
    frames = int(os.environ.get("BENCH_FRAMES", "4"))
    cfg, net, params, settings, apply_fn = _flagship()
    ray_chunk = int(os.environ.get("BENCH_RAY_CHUNK",
                                   cfg.task_arg.get("ray_chunk", 20000)))

    focal = 0.5 * W / np.tan(0.5 * 0.6911112070083618)
    poses = [look_at_pose(np.array(
        [4.0 * np.cos(a), 4.0 * np.sin(a), 1.5], dtype=np.float32))
        for a in np.linspace(0, 2 * np.pi, frames + 1)[:-1]]

    n_rays = H * W
    n_pad = (-n_rays) % ray_chunk

    @jax.jit
    def render_image(params, rays_o, rays_d):
        ro = jnp.pad(rays_o, ((0, n_pad), (0, 0)))
        rd = jnp.pad(rays_d, ((0, n_pad), (0, 0)), constant_values=1.0)
        ro = ro.reshape(-1, ray_chunk, 3)
        rd = rd.reshape(-1, ray_chunk, 3)
        out = jax.lax.map(
            lambda rr: render_rays(apply_fn, params, rr[0], rr[1], None,
                                   settings, train=False)["rgb"],
            (ro, rd))
        return out.reshape(-1, 3)[:n_rays]

    def fetch(x):
        # host transfer: the only reliable completion fence on the
        # experimental tunneled backend (block_until_ready returns early)
        return float(jnp.sum(x))

    # warmup / compile
    ro, rd = rays_for_camera(jnp.asarray(poses[0]), H, W, focal)
    fetch(render_image(params, ro, rd))

    times = []
    for pose in poses:
        ro, rd = rays_for_camera(jnp.asarray(pose), H, W, focal)
        fetch(ro)
        t0 = time.time()
        img = render_image(params, ro, rd)
        fetch(img)
        times.append(time.time() - t0)
        print(f"frame: {times[-1]:.3f}s", file=sys.stderr)

    fps = 1.0 / float(np.mean(times))
    print(json.dumps({
        "metric": "render_fps_800x800",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 5.0, 3),
    }))


if __name__ == "__main__":
    main()
