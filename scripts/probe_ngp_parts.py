#!/usr/bin/env python
"""Component-level timing of the hash-grid train step (probe_ngp
shapes): encode forward, encode fwd+bwd (sorted vs scatter), MLP, and
the full train step. All timed as in-program lax.scan loops so the
numbers are pure device time.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_replication_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from nerf_replication_tpu.models.encoding.hashgrid import (
    HashGridEncoder, _level_layout, hash_encode)

REPS = int(os.environ.get("REPS", "50"))
N = int(os.environ.get("N", str(1024 * 160)))  # points per step


def timed(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS
    print(json.dumps({"name": name, "ms_per_rep": round(dt * 1e3, 3),
                      "n_points": N}), flush=True)
    return dt


def scan_loop(body, init_x):
    def fn(x):
        def step(c, _):
            return body(c), None
        y, _ = jax.lax.scan(step, x, None, length=REPS)
        return y
    return fn


def main():
    enc = HashGridEncoder(input_dim=3, n_levels=12, n_features=2,
                          log2_hashmap_size=17, base_resolution=16,
                          finest_resolution=256, input_grad=False,
                          sorted_bwd=True)
    key = jax.random.key(0)
    x = jax.random.uniform(key, (N, 3))
    params = enc.init(key, x)
    table = params["params"]["table"]
    print(json.dumps({"table_rows": int(table.shape[0]),
                      "table_mb": round(table.size * 4 / 2**20, 2)}),
          flush=True)

    layout_ng = None
    scales, offsets, use_hash, tsize = _level_layout(3, 12, 17, 16, 256, 2.0)
    layout_sorted = (tuple(scales), tuple(offsets), tuple(use_hash), tsize,
                     3, 2, False, True)
    layout_scatter = (tuple(scales), tuple(offsets), tuple(use_hash), tsize,
                      3, 2, False, False)

    # forward only
    def fwd_body(x):
        o = hash_encode(layout_sorted, table, x)
        return x + o[:, :3] * 1e-12
    timed("encode_fwd", scan_loop(fwd_body, x), x)

    # fwd+bwd sorted
    def fb_sorted(tbl):
        def loss(tbl):
            return hash_encode(layout_sorted, tbl, x).sum()
        g = jax.grad(loss)(tbl)
        return tbl + g * 1e-12
    timed("encode_fwd_bwd_sorted", scan_loop(fb_sorted, table), table)

    # fwd+bwd scatter
    def fb_scatter(tbl):
        def loss(tbl):
            return hash_encode(layout_scatter, tbl, x).sum()
        g = jax.grad(loss)(tbl)
        return tbl + g * 1e-12
    timed("encode_fwd_bwd_scatter", scan_loop(fb_scatter, table), table)

    # small MLP fwd+bwd at same point count (64w x 3d)
    wkey = jax.random.key(1)
    W1 = jax.random.normal(wkey, (24, 64)) * 0.1
    W2 = jax.random.normal(wkey, (64, 64)) * 0.1
    W3 = jax.random.normal(wkey, (64, 4)) * 0.1
    feats = jax.random.normal(wkey, (N, 24))

    def mlp_body(ws):
        w1, w2, w3 = ws
        def loss(ws):
            w1, w2, w3 = ws
            h = jax.nn.relu(feats @ w1)
            h = jax.nn.relu(h @ w2)
            return (h @ w3).sum()
        g = jax.grad(loss)(ws)
        return tuple(w + gg * 1e-12 for w, gg in zip(ws, g))
    timed("mlp_fwd_bwd", scan_loop(mlp_body, (W1, W2, W3)), (W1, W2, W3))


if __name__ == "__main__":
    main()
