#!/usr/bin/env python
"""Quality side of the fused-MLP train ablation (VERDICT r4 item 6).

The throughput side is result/abl_train_mlp.json (fused +25-35% train
rays/s). This evaluates the CHECKPOINT the fused arm trained
(data/pretrain/hard_fmlp, a full QR_FUSED_MLP=1 quality run on the
"hard" 800^2 scene) on the 8-view test split with the same uint8-PSNR /
win-7 SSIM definitions as every other quality artifact, next to the
committed XLA-arm result (result/quality_r5_freq.jsonl: 31.09 dB /
0.9742), and records the default decision.

Output: result/abl_mlp_quality.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np

    from nerf_replication_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from nerf_replication_tpu.config import default_cfg, load_cfg_tree
    from nerf_replication_tpu.datasets.nerf.blender import Dataset
    from nerf_replication_tpu.datasets.pipeline import rays_for_camera
    from nerf_replication_tpu.evaluators.metrics import psnr_uint8, ssim
    from nerf_replication_tpu.models import make_network
    from nerf_replication_tpu.models.nerf.renderer.volume_renderer import (
        RenderSettings,
        Renderer,
    )
    from nerf_replication_tpu.utils.ckpt_utils import load_pretrain

    ckpt = os.environ.get(
        "ABL_CKPT", os.path.join(ROOT, "data", "pretrain", "hard_fmlp"))
    cfg = load_cfg_tree(os.path.join(
        ROOT, os.environ.get("ABL_CFG", "configs/nerf/hard.yaml")),
        default_cfg())
    cfg.scene = os.environ.get("ABL_SCENE", "hard")
    cfg.test_dataset.data_root = os.path.join(ROOT, "data", "synthetic")
    size = int(os.environ.get("ABL_SIZE", "800"))
    cfg.test_dataset.H = cfg.test_dataset.W = size

    net = make_network(cfg)
    params = load_pretrain(ckpt)
    if params is None:
        sys.exit(f"no pretrain.ckpt under {ckpt}")

    renderer = Renderer(net, settings=RenderSettings.from_cfg(cfg), mesh=None)
    test_ds = Dataset(cfg, **{**cfg.test_dataset, "split": "test"})
    psnrs, ssims = [], []
    t0 = time.time()
    for i, (img, pose) in enumerate(zip(test_ds.images, test_ds.poses)):
        ro, rd = rays_for_camera(pose, test_ds.H, test_ds.W, test_ds.focal)
        out = renderer.render_image_fast(params, np.asarray(ro),
                                         np.asarray(rd))
        pred = np.clip(out["rgb"].reshape(test_ds.H, test_ds.W, 3), 0, 1)
        p8 = (pred * 255).astype(np.uint8)
        g8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        psnrs.append(float(psnr_uint8(pred, img)))
        ssims.append(float(ssim(p8, g8, win_size=7, channel_axis=2)))
        print(f"test{i}: {psnrs[-1]:.2f} dB / {ssims[-1]:.4f}", flush=True)

    rec = {
        "ckpt": os.path.relpath(ckpt, ROOT),
        "arm": "fused (use_pallas_mlp_train=True, QR_FUSED_MLP=1 run)",
        "test_psnr": round(float(np.mean(psnrs)), 2),
        "test_ssim": round(float(np.mean(ssims)), 4),
        "per_view_psnr": [round(p, 2) for p in psnrs],
        "xla_arm_ref": {"artifact": "result/quality_r5_freq.jsonl",
                        "test_psnr": 31.09, "test_ssim": 0.9742},
        "throughput_ref": "result/abl_train_mlp.json",
        "eval_s": round(time.time() - t0, 1),
    }
    out_path = os.environ.get(
        "ABL_OUT", os.path.join(ROOT, "result", "abl_mlp_quality.json"))
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
