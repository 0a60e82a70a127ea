#!/usr/bin/env python
"""XLA TPU gather microbenchmark: cost vs table rows, row width, dtype,
gather axis. Informs the hash-grid encoder design."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nerf_replication_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

REPS = 20
NIDX = 1 << 24  # 16.7M indices, close to the probe_ngp per-step count


def timed(name, fn, *args):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))
    t0 = time.time()
    out = jax.block_until_ready(fn_j(*args))
    dt = (time.time() - t0) / REPS
    ns_per_idx = dt * 1e9 / NIDX
    print(json.dumps({"name": name, "ms": round(dt * 1e3, 2),
                      "ns_per_idx": round(ns_per_idx, 2)}), flush=True)


def scan(body):
    def fn(x, idx):
        def step(c, _):
            return body(c, idx), None
        y, _ = jax.lax.scan(step, x, None, length=REPS)
        return y
    return fn


def main():
    key = jax.random.key(0)

    for rows, width, dt_ in [
        (1 << 20, 2, jnp.float32),
        (1 << 20, 8, jnp.float32),
        (1 << 20, 128, jnp.float32),
        (1 << 17, 2, jnp.float32),
        (1 << 13, 2, jnp.float32),
        (1 << 10, 2, jnp.float32),
        (1 << 20, 2, jnp.bfloat16),
    ]:
        tab = jax.random.normal(key, (rows, width), dt_)
        idx = jax.random.randint(key, (NIDX,), 0, rows, jnp.int32)

        def body(t, i):
            v = jnp.take(t, i, axis=0)                 # (NIDX, width)
            return t + v.sum(0, keepdims=True).astype(t.dtype) * 1e-12
        timed(f"take_ax0_r{rows}_w{width}_{dt_.__name__}",
              scan(body), tab, idx)

    # transposed: gather along lanes
    tab = jax.random.normal(key, (2, 1 << 20), jnp.float32)
    idx = jax.random.randint(key, (NIDX,), 0, 1 << 20, jnp.int32)

    def body_t(t, i):
        v = jnp.take(t, i, axis=1)                     # (2, NIDX)
        return t + v.sum(1, keepdims=True) * 1e-12
    timed("take_ax1_r1M_w2_f32", scan(body_t), tab, idx)

    # one-hot matmul from a small table (MXU route)
    rows = 1 << 10
    tab = jax.random.normal(key, (rows, 2), jnp.float32)
    idx = jax.random.randint(key, (NIDX,), 0, rows, jnp.int32)

    def body_oh(t, i):
        oh = jax.nn.one_hot(i, rows, dtype=jnp.bfloat16)
        v = oh @ t.astype(jnp.bfloat16)
        return t + v.sum(0, keepdims=True).astype(t.dtype) * 1e-12
    timed("onehot_matmul_r1k_w2", scan(body_oh), tab, idx)


if __name__ == "__main__":
    main()
