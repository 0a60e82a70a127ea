#!/usr/bin/env python
"""Localize the fast-NGP vs dense render error (bench gate diagnosis).

Renders one GT test view on the dense path and the occupancy-raymarch
path, then splits the squared error by pixel class:

  * probe-inactive (fast path composites pure background)
  * active, low coarse opacity (fine pass skipped-by-capacity candidates)
  * active, high opacity (surface pixels)

and reports each class's pixel count, MSE share, and worst pixels.
Run on TPU (default) or CPU with DIAG_SIZE=100 for a quick probe scene.

Env: DIAG_CFG, DIAG_CKPT, DIAG_VIEW, DIAG_LADDER="C,M,F", DIAG_SIZE.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_replication_tpu.config import default_cfg, load_cfg_tree
    from nerf_replication_tpu.datasets.nerf.blender import Dataset as BlenderDS
    from nerf_replication_tpu.evaluators.metrics import psnr_uint8
    from nerf_replication_tpu.models import make_network
    from nerf_replication_tpu.models.nerf.renderer.ngp_renderer import (
        make_ngp_eval_apply,
        make_ngp_frame_renderer,
    )
    from nerf_replication_tpu.models.nerf.renderer.volume_renderer import (
        Renderer,
        RenderSettings,
    )
    from nerf_replication_tpu.ops.occupancy import build_occupancy_grid, ray_spans
    from nerf_replication_tpu.ops.ray_ops import density_activation
    from nerf_replication_tpu.utils.ckpt_utils import load_pretrain
    from nerf_replication_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    cfg_file = os.environ.get("DIAG_CFG", "configs/nerf/hard_ngp.yaml")
    cfg = load_cfg_tree(os.path.join(ROOT, cfg_file), default_cfg())
    ckpt = os.environ.get("DIAG_CKPT",
                          os.path.join(ROOT, "data/pretrain/hard_ngp_b9"))
    params = jax.tree.map(jnp.asarray, load_pretrain(ckpt))
    rows = params["params"]["xyz_encoder"]["table"].shape[0]
    from bench import _detect_bricks
    cfg.network.xyz_encoder["log2_bricks"] = _detect_bricks(
        rows, cfg.network.xyz_encoder)

    ds = BlenderDS(cfg, **{**dict(cfg.test_dataset), "split": "test"})
    view = int(os.environ.get("DIAG_VIEW", "0"))
    gt = ds.images[view]
    pose = ds.poses[view]
    H, W, focal = ds.H, ds.W, float(ds.focal)

    net = make_network(cfg)
    apply_fn = make_ngp_eval_apply(net, params)
    settings = dataclasses.replace(
        RenderSettings.from_cfg(cfg),
        ray_chunk=int(cfg.task_arg.get("ray_chunk", 8000)),
        fast_sampling=False)
    act = density_activation(settings.density_activation)

    def density_fn(p, pts):
        return act(apply_fn(p, pts[:, None, :],
                            jnp.zeros((1, 1, 3)), "fine")[:, 0, 3])

    grid, bbox = build_occupancy_grid(
        density_fn, params, resolution=64, threshold=0.02, dilate=2)
    print(f"occupancy: {float(grid.mean()):.3f}", flush=True)

    from bench import ray_grid
    ro, rd = ray_grid(H, W, focal, pose)
    renderer = Renderer(net, settings=settings, mesh=None).use_apply(apply_fn)
    t0 = time.time()
    dense = np.clip(np.asarray(
        renderer.render_rays_batch(params, ro, rd)["rgb"]), 0, 1)
    dense = dense.reshape(H, W, 3)
    print(f"dense: {time.time()-t0:.1f}s  PSNR(GT) "
          f"{psnr_uint8(dense, gt):.2f}", flush=True)

    lad = [int(v) for v in os.environ.get(
        "DIAG_LADDER", "32,14,12").split(",")]
    C, M, F = lad[:3]
    F2 = lad[3] if len(lad) > 3 else 0
    fn = make_ngp_frame_renderer(
        apply_fn, H, W, focal=focal, occupancy=(grid, bbox, 2), s=settings,
        n_candidates=C, n_coarse=M, n_fine=F, n_fine2=F2, capacity=0.45,
        fine_capacity=0.30, out_dtype=jnp.float32, return_stats=True,
        probe_sub=int(os.environ.get("DIAG_SUB", "4")))
    t0 = time.time()
    fast, stats = fn(params, jnp.asarray(pose))
    fast = np.clip(np.asarray(fast), 0, 1).reshape(H, W, 3)
    print(f"fast C={C},M={M},F={F},F2={F2}: {time.time()-t0:.1f}s  "
          f"stats={ {k: float(v) for k, v in stats.items()} }", flush=True)

    # probe-active mask exactly as the renderer computes it (sub=4 path)
    r = grid.shape[0]
    cell = max((bbox[3 + d] - bbox[d]) / r for d in range(3))
    n_probe = int(np.ceil((settings.far - settings.near) / cell)) + 1
    t_probe = jnp.linspace(settings.near, settings.far, n_probe)
    step = (settings.far - settings.near) / (n_probe - 1)
    sub = 4
    rd_g = rd.reshape(H, W, 3)[sub // 2::sub, sub // 2::sub].reshape(-1, 3)
    ro_g = np.broadcast_to(pose[:3, 3], rd_g.shape)
    act_s, te, tx = jax.jit(ray_spans, static_argnames=())(
        jnp.asarray(ro_g), jnp.asarray(rd_g), t_probe, grid, bbox,
        margin=2.0 * step)
    active = np.repeat(np.repeat(
        np.asarray(act_s).reshape(H // sub, W // sub), sub, 0), sub, 1)

    err2 = ((fast - dense) ** 2).mean(-1)
    gt_err2 = ((fast - gt) ** 2).mean(-1)
    dense_err2 = ((dense - gt) ** 2).mean(-1)
    classes = {
        "inactive": ~active,
        "active": active,
    }
    tot = err2.mean()
    print(f"\nfast-vs-dense total MSE {tot:.3e} "
          f"({-10*np.log10(tot):.1f} dB)")
    for name, m in classes.items():
        if m.sum() == 0:
            continue
        share = err2[m].sum() / err2.sum()
        print(f"  {name:9s}: {int(m.sum()):7d} px, MSE {err2[m].mean():.3e},"
              f" share of error {share:.1%}, worst {err2[m].max():.3e}")
    bad = err2 > 0.01
    print(f"  pixels with err2>0.01: {int(bad.sum())} "
          f"({int((bad & ~active).sum())} inactive)")
    # where are the bad pixels relative to GT coverage (silhouettes)?
    if ds.alphas:
        alpha = ds.alphas[view]
        interior = (alpha > 0.99)
        edge = (alpha > 0.01) & ~interior
        bg = alpha <= 0.01
        for nm, m in (("gt-interior", interior), ("gt-edge", edge),
                      ("gt-bg", bg)):
            print(f"  {nm:11s}: {int(m.sum()):7d} px, vs-dense MSE "
                  f"{err2[m].mean():.3e}, share {err2[m].sum()/err2.sum():.1%}")
    print(f"\nGT PSNR: dense {psnr_uint8(dense, gt):.2f}, "
          f"fast {psnr_uint8(fast, gt):.2f}")
    # decompose: is the fast GT error just dense GT error + vs-dense?
    print(f"MSE(GT): dense {dense_err2.mean():.3e}, fast "
          f"{gt_err2.mean():.3e}, vs-dense {err2.mean():.3e}")
    np.save(os.path.join(ROOT, "result/diag_err2.npy"), err2)
    np.save(os.path.join(ROOT, "result/diag_active.npy"), active)
    from PIL import Image
    Image.fromarray((dense * 255).astype(np.uint8)).save(
        os.path.join(ROOT, "result/diag_dense.png"))
    Image.fromarray((fast * 255).astype(np.uint8)).save(
        os.path.join(ROOT, "result/diag_fast.png"))
    hm = np.clip(np.sqrt(err2) * 4.0, 0, 1)
    Image.fromarray((np.stack([hm, hm * 0, active * 0.3], -1)
                     * 255).astype(np.uint8)).save(
        os.path.join(ROOT, "result/diag_err.png"))
    print("saved result/diag_{err2,active}.npy + {dense,fast,err}.png")


if __name__ == "__main__":
    main()
