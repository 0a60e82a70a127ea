#!/usr/bin/env python
"""Fused-MLP training ablation (VERDICT r2 task 6).

Question: would a differentiable Pallas fused MLP pay on the frequency
flagship's train step? Evidence gathered here:

1. train rays/s at N_rays 1024 / 2048 / 4096 (lr-scaling equivalent
   batch growth): if throughput is flat, the step is compute(work)-
   bound, not dispatch/input-bound — a faster MLP kernel would pay
   proportionally to the MLP's share;
2. the step's achieved FLOP rate vs the XLA-MLP roofline measured in
   round 2 (57 TFLOP/s fwd; the fused eval kernel does 84-98).

Writes result/abl_train_mlp.json and prints one line per config.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import numpy as np

    from nerf_replication_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _flagship
    from nerf_replication_tpu.datasets.pipeline import DeviceRayPipeline
    from nerf_replication_tpu.train import make_trainer
    from nerf_replication_tpu.train.recorder import make_recorder

    steps = int(os.environ.get("ABL_STEPS", "200"))
    # ABL_OUT: CPU smokes must not overwrite the queue's TPU artifact
    # (the stage-skip check treats mere existence as completion)
    out = os.environ.get(
        "ABL_OUT", os.path.join(ROOT, "result", "abl_train_mlp.json"))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    rows = []

    def flush_rows():
        # write after EVERY config: a late compile failure (e.g. a
        # remote-compile 500 at the largest batch) must not lose the
        # finished measurements (r5 queue lost 4 rows this way)
        with open(out, "w") as f:
            json.dump(rows, f, indent=2)

    for n_rays in (1024, 2048, 4096):
      for mlp_path in ("xla", "fused"):
       try:
        cfg, net, params, settings, apply_fn = _flagship(n_rays=n_rays)
        cfg.ep_iter = steps
        cfg.task_arg.N_rays = n_rays
        cfg.network["use_pallas_mlp_train"] = mlp_path == "fused"

        rng = np.random.default_rng(0)
        images = rng.uniform(size=(8, 128, 128, 3)).astype(np.float32)
        poses = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
        poses[:, 2, 3] = 4.0
        K = np.array([[128.0, 0, 64.0], [0, 128.0, 64.0], [0, 0, 1.0]],
                     np.float32)
        pipeline = DeviceRayPipeline(images, poses, K, n_rays=n_rays)
        trainer = make_trainer(cfg, net)
        recorder = make_recorder(cfg)
        state = trainer.init_state(params)
        # epoch 0: compile + warmup; epoch 1: measured
        state = trainer.train_device(0, pipeline, state, recorder)
        t0 = time.time()
        state = trainer.train_device(1, pipeline, state, recorder)
        float(np.asarray(jax.tree.leaves(state["params"])[0]).sum())
        dt = time.time() - t0
        rays_s = n_rays * steps / dt
        # per-point MLP work: coarse 64 + fine 192 samples, fwd+bwd ~ 3x
        # fwd FLOPs, 8x256 MLP ~ 1.19 MFLOP/pt fwd
        pts = n_rays * steps * (64 + 192)
        tflops = pts * 1.19e6 * 3 / dt / 1e12
        row = {"n_rays": n_rays, "mlp": mlp_path, "steps": steps,
               "wall_s": round(dt, 2), "rays_per_s": round(rays_s),
               "approx_mlp_tflops": round(tflops, 1)}
       except Exception as e:  # noqa: BLE001 — keep the other configs
        row = {"n_rays": n_rays, "mlp": mlp_path, "steps": steps,
               "error": type(e).__name__, "msg": str(e)[:200]}
       rows.append(row)
       print(json.dumps(row), flush=True)
       flush_rows()
    print("wrote", out)


if __name__ == "__main__":
    main()
