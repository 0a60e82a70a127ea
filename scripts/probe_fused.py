#!/usr/bin/env python
"""ns/pt sweep of the fused encode+MLP eval kernel (fused_ngp.py):
block size x MLP precision, flagship hard_ngp_b9 shapes, ray-ordered
points (surface-clustered like the real fine pass). Run on TPU."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from nerf_replication_tpu.config import default_cfg, load_cfg_tree
    from nerf_replication_tpu.models import make_network
    from nerf_replication_tpu.models.nerf.network import init_params
    from nerf_replication_tpu.ops.pallas import hashgrid_kernel as hk
    from nerf_replication_tpu.ops.pallas.eval_encode import pack_eval_table
    from nerf_replication_tpu.ops.pallas.fused_ngp import (
        extract_mlp_weights,
        fused_ngp_eval,
    )
    from nerf_replication_tpu.utils.ckpt_utils import load_pretrain
    from nerf_replication_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = load_cfg_tree(os.path.join(ROOT, "configs/nerf/hard_ngp.yaml"),
                        default_cfg())
    force_bricks = int(os.environ.get("PROBE_BRICKS", "0"))
    ckpt = os.path.join(ROOT, "data/pretrain/hard_ngp_b9")
    if force_bricks:
        bricks = force_bricks
        cfg.network.xyz_encoder["log2_bricks"] = bricks
        params = init_params(make_network(cfg), jax.random.key(0))
    elif os.path.isdir(ckpt):
        params = jax.tree.map(jnp.asarray, load_pretrain(ckpt))
        rows = params["params"]["xyz_encoder"]["table"].shape[0]
        bricks = bench._detect_bricks(rows, cfg.network.xyz_encoder)
    else:
        bricks = 9
        cfg.network.xyz_encoder["log2_bricks"] = bricks
        params = init_params(make_network(cfg), jax.random.key(0))
    cfg.network.xyz_encoder["log2_bricks"] = bricks
    net = make_network(cfg)
    enc = net.xyz_encoder
    layout = hk.make_brick_layout(
        enc.n_levels, enc.base_resolution, enc.finest_resolution,
        log2_bricks=enc.log2_bricks, per_level_scale=enc.per_level_scale)
    packed = pack_eval_table(
        jnp.asarray(params["params"]["xyz_encoder"]["table"]))
    mlp = net.fine
    ops, meta = extract_mlp_weights(
        params["params"]["fine"], 2 * len(layout.scales), mlp.depth,
        tuple(mlp.skips), mlp.view_depth)

    # ray-ordered surface-clustered points: 160k rays x 13 samples in a
    # thin shell (mimics the fine pass access pattern)
    rng = np.random.default_rng(0)
    n_rays, spr = 160_000, 13
    c = rng.normal(size=(n_rays, 1, 3)) * 0.15 + 0.5
    t = np.linspace(-0.02, 0.02, spr)[None, :, None]
    d = rng.normal(size=(n_rays, 1, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pts = np.clip(c + t * d, 0.0, 1.0).reshape(-1, 3).astype(np.float32)
    sh = rng.normal(size=(pts.shape[0], 16)).astype(np.float32)
    N = pts.shape[0]
    xs, shs = jnp.asarray(pts), jnp.asarray(sh)
    print(f"{N} points, bricks={bricks}, rows={layout.n_rows}")

    blks = (512, 1024, 2048, 4096)
    if os.environ.get("PROBE_BLKS"):
        blks = tuple(int(b) for b in os.environ["PROBE_BLKS"].split(","))
    for blk in blks:
        for bf16 in (False, True):
            for cg in (False, True):
                fn = jax.jit(
                    lambda x, s, blk=blk, bf16=bf16, cg=cg: jnp.sum(
                        fused_ngp_eval(layout, meta, packed, ops, x, s,
                                       blk=blk, mlp_bf16=bf16,
                                       combined_gather=cg)))
                try:
                    float(fn(xs, shs))
                except Exception as e:  # noqa: BLE001 — report, continue
                    print(f"blk={blk} bf16={int(bf16)} cg={int(cg)}: "
                          f"FAILED {e}")
                    continue
                times = []
                for _ in range(5):
                    t0 = time.time()
                    float(fn(xs, shs))
                    times.append(time.time() - t0)
                dt = float(np.median(times))
                print(f"blk={blk} bf16={int(bf16)} cg={int(cg)}: "
                      f"{N / dt / 1e6:6.2f} Mpts/s  "
                      f"{dt / N * 1e9:6.1f} ns/pt", flush=True)


if __name__ == "__main__":
    main()
