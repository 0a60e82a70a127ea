#!/usr/bin/env python
"""Micro-probes isolating the hash-grid train-step cost/crash on TPU.

Each probe is one process invocation (so a worker crash in one probe
doesn't corrupt the next measurement):

  PROBE=health    — 1-op tunnel health check
  PROBE=sort      — jit argsort+take of M gradient rows (the round-2
                    sorted-backward hot op), M=PROBE_M (default 15.7M)
  PROBE=fwd       — encoder forward only (hash_encode), batched points
  PROBE=step      — ONE full NGP train step (no scan), dispatched
                    PROBE_REPS times sequentially
  PROBE=scan      — PROBE_SCAN-step lax.scan of the train step

Env: PROBE_VARIANT=sorted|scatter, PROBE_M, PROBE_REPS (default 10),
PROBE_SCAN (default 50), PROBE_RAYS (default 1024).

Prints one JSON line per probe.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def fetch(x):
    import numpy as np

    return np.asarray(x)


def probe_health():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    v = float(fetch(jax.jit(lambda x: x.sum())(jnp.ones(128))))
    _emit(probe="health", ok=v == 128.0, sec=round(time.time() - t0, 2))


def probe_sort():
    import jax
    import jax.numpy as jnp

    m = int(os.environ.get("PROBE_M", str(160 * 1024 * 12 * 8)))
    reps = int(os.environ.get("PROBE_REPS", "10"))
    f = 2

    @jax.jit
    def run(ids, u):
        order = jnp.argsort(ids)
        return jax.ops.segment_sum(u[order], ids[order],
                                   num_segments=1 << 21,
                                   indices_are_sorted=True)

    key = jax.random.key(0)
    ids = jax.random.randint(key, (m,), 0, 1 << 21, dtype=jnp.int32)
    u = jax.random.normal(key, (m, f), jnp.float32)
    fetch(run(ids, u)[:1])  # compile
    t0 = time.time()
    for _ in range(reps):
        out = run(ids, u)
    fetch(out[:1])
    dt = (time.time() - t0) / reps
    _emit(probe="sort", m=m, sec_per_call=round(dt, 4))


def _build_step():
    import jax
    import numpy as np

    from nerf_replication_tpu.config import default_cfg, load_cfg_tree
    from nerf_replication_tpu.datasets.pipeline import DeviceRayPipeline
    from nerf_replication_tpu.models import make_network
    from nerf_replication_tpu.models.nerf.network import init_params
    from nerf_replication_tpu.train import make_trainer

    variant = os.environ.get("PROBE_VARIANT", "sorted")
    n_rays = int(os.environ.get("PROBE_RAYS", "1024"))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_cfg_tree(os.path.join(root, "configs/nerf/probe_ngp.yaml"),
                        default_cfg())
    cfg.task_arg.N_rays = n_rays
    cfg.task_arg.precrop_iters = 0
    cfg.network.xyz_encoder["sorted_bwd"] = variant == "sorted"
    if os.environ.get("PROBE_DTYPE"):
        cfg.network.xyz_encoder["compute_dtype"] = os.environ["PROBE_DTYPE"]

    net = make_network(cfg)
    params = init_params(net, jax.random.key(0))
    trainer = make_trainer(cfg, net)
    state = trainer.init_state(params)

    rng = np.random.default_rng(0)
    images = rng.uniform(size=(4, 64, 64, 3)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    poses[:, 2, 3] = 4.0
    K = np.array([[64.0, 0, 32], [0, 64, 32], [0, 0, 1]], np.float32)
    pipe = DeviceRayPipeline(images, poses, K, n_rays=n_rays)
    return trainer, pipe, state, variant, n_rays


def probe_fwd():
    import jax
    import jax.numpy as jnp

    from nerf_replication_tpu.models.encoding.hashgrid import HashGridEncoder

    n = int(os.environ.get("PROBE_M", str(1024 * 160)))
    reps = int(os.environ.get("PROBE_REPS", "10"))
    enc = HashGridEncoder(n_levels=12, log2_hashmap_size=17,
                          base_resolution=16, finest_resolution=256,
                          input_grad=False)
    key = jax.random.key(0)
    x = jax.random.uniform(key, (n, 3))
    params = enc.init(key, x)
    f = jax.jit(lambda p, x: enc.apply(p, x))
    fetch(f(params, x)[:1])
    t0 = time.time()
    for _ in range(reps):
        out = f(params, x)
    fetch(out[:1])
    _emit(probe="fwd", n=n,
          sec_per_call=round((time.time() - t0) / reps, 4))


def probe_step():
    import jax

    trainer, pipe, state, variant, n_rays = _build_step()
    reps = int(os.environ.get("PROBE_REPS", "10"))
    data = pipe.data()

    def one(state, key):
        batch = pipe.sample(key, state["step"], data=data)
        return trainer._train_step_inner(state, batch, key)

    step = jax.jit(one)
    key = jax.random.key(1)
    state, stats = step(state, key)
    fetch(stats["loss"])  # compile fence
    t0 = time.time()
    for _ in range(reps):
        state, stats = step(state, key)
    fetch(stats["loss"])
    dt = (time.time() - t0) / reps
    _emit(probe="step", variant=variant, sec_per_step=round(dt, 4),
          rays_per_s=round(n_rays / dt, 1))


def probe_scan():
    import jax
    from functools import partial

    trainer, pipe, state, variant, n_rays = _build_step()
    steps = int(os.environ.get("PROBE_SCAN", "50"))
    data = pipe.data()

    def one(data, state, key):
        batch = pipe.sample(key, state["step"], data=data)
        return trainer._train_step_inner(state, batch, key)

    @jax.jit
    def run(state, key, data):
        keys = jax.random.split(key, steps)
        return jax.lax.scan(partial(one, data), state, keys)

    state, stats = run(state, jax.random.key(1), data)
    fetch(stats["loss"][-1])
    t0 = time.time()
    state, stats = run(state, jax.random.key(2), data)
    fetch(stats["loss"][-1])
    dt = time.time() - t0
    _emit(probe="scan", variant=variant, steps=steps,
          sec=round(dt, 3), rays_per_s=round(steps * n_rays / dt, 1))


def main():
    from nerf_replication_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    probe = os.environ.get("PROBE", "health")
    {"health": probe_health, "sort": probe_sort, "fwd": probe_fwd,
     "step": probe_step, "scan": probe_scan}[probe]()


if __name__ == "__main__":
    main()
