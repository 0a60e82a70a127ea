#!/usr/bin/env python
"""Minimal repro probe for the round-1 TPU worker crash: a LONG donated
lax.scan over hash-grid train steps (the round-1 trainer crashed the
worker on these; the workaround is 50-step undonated sub-scans).

Runs ONE donated 500-step scan of the probe_ngp-style train step and
prints survival + timing, for each backward variant:
  REPRO_VARIANT=sorted  (round-2 default: sort+segment-sum backward)
  REPRO_VARIANT=scatter (round-1 formulation: XLA scatter-add)

Exit 0 = survived. A worker crash surfaces as a JaxRuntimeError (the
tunnel recovers in ~10 min) — run this LAST in any TPU queue.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_replication_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from nerf_replication_tpu.config import default_cfg, load_cfg_tree
    from nerf_replication_tpu.datasets.pipeline import DeviceRayPipeline
    from nerf_replication_tpu.models import make_network
    from nerf_replication_tpu.models.nerf.network import init_params
    from nerf_replication_tpu.train import make_trainer

    variant = os.environ.get("REPRO_VARIANT", "sorted")
    steps = int(os.environ.get("REPRO_STEPS", "500"))

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_cfg_tree(os.path.join(root, "configs/nerf/probe_ngp.yaml"),
                        default_cfg())
    cfg.task_arg.N_rays = 1024
    cfg.task_arg.precrop_iters = 0
    cfg.network.xyz_encoder["sorted_bwd"] = variant == "sorted"

    net = make_network(cfg)
    params = init_params(net, jax.random.key(0))
    trainer = make_trainer(cfg, net)
    state = trainer.init_state(params)

    rng = np.random.default_rng(0)
    images = rng.uniform(size=(4, 64, 64, 3)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    poses[:, 2, 3] = 4.0
    K = np.array([[64.0, 0, 32], [0, 64, 32], [0, 0, 1]], np.float32)
    pipe = DeviceRayPipeline(images, poses, K, n_rays=1024)
    data = pipe.data()

    def one_step(data, state, step_key):
        k_data, k_render = jax.random.split(step_key)
        batch = pipe.sample(k_data, state["step"], data=data)
        return trainer._train_step_inner(state, batch, k_render)

    def long_scan(state, key, data):
        # `data` rides as an argument (not an HLO constant)
        from functools import partial
        keys = jax.random.split(key, steps)
        return jax.lax.scan(partial(one_step, data), state, keys)

    long_scan_donated = jax.jit(long_scan, donate_argnums=0)

    t0 = time.time()
    state, stats = long_scan_donated(state, jax.random.key(1), data)
    loss = float(np.asarray(stats["loss"])[-1])  # host fetch = fence
    dt = time.time() - t0
    print(json.dumps({
        "variant": variant, "steps": steps, "survived": True,
        "loss": round(loss, 5), "sec": round(dt, 2),
        "rays_per_s": round(steps * 1024 / dt, 1),
    }))


if __name__ == "__main__":
    main()
