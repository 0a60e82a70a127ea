#!/usr/bin/env python
"""Component-level TPU perf probes for the render + hash-grid hot paths.

Each probe is ONE jitted program (compile-cache friendly), timed with the
host-fetch fence required on the tunneled backend. Results stream to
stdout and to result/perf_probe.jsonl so a wedged probe doesn't lose
earlier data.

Select probes: PROBES=mlp_xla,mlp_pallas,... (default: all render probes;
add hash probes with PROBES=all).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "result", "perf_probe.jsonl")

RENDER_PROBES = ("mlp_xla", "mlp_pallas", "encode", "sample_pdf", "sort192",
                 "gather_flat")
HASH_PROBES = ("hash_fwd", "hash_step")


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def timed(fn, args, iters, fence):
    """Dispatch `iters` back-to-back executions; fence once at the end."""
    import numpy as np

    out = fn(*args)
    fence(out)  # warm / compile
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_replication_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    sel = os.environ.get("PROBES", "render")
    if sel == "render":
        probes = RENDER_PROBES
    elif sel == "hash":
        probes = HASH_PROBES
    elif sel == "all":
        probes = RENDER_PROBES + HASH_PROBES
    else:
        probes = tuple(sel.split(","))

    def fence(x):
        leaves = jax.tree.leaves(x)
        return float(np.asarray(leaves[0]).ravel()[0])

    N_RAYS = 40000
    S = 64
    N_PTS = N_RAYS * S  # 2.56M — the bench coarse-chunk shape

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1, 1, (N_RAYS, S, 3)).astype(np.float32))
    dirs_np = rng.normal(size=(N_RAYS, 1, 3)).astype(np.float32)
    dirs_np /= np.linalg.norm(dirs_np, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs_np)

    # true (unpadded) MLP MACs per point for the flagship 8x256 arch
    IN, VW, W = 63, 27, 256
    MACS = (IN * W + 3 * W * W + (IN + W) * W + 2 * W * W + W * (W + 1)
            + (W + VW) * (W // 2) + (W // 2) * 3)
    FLOPS_PT = 2 * MACS

    if any(p in probes for p in ("mlp_xla", "mlp_pallas", "encode")):
        from __graft_entry__ import _flagship
        cfg, net, params, settings, apply_fn = _flagship()

    if "mlp_xla" in probes:
        f = jax.jit(lambda p, x, d: apply_fn(p, x, d, ""))
        dt = timed(f, (params, pts, dirs), 4, fence)
        emit({"probe": "mlp_xla", "pts": N_PTS, "sec": round(dt, 4),
              "tflops": round(N_PTS * FLOPS_PT / dt / 1e12, 1)})

    if "encode" in probes:
        xe, de = net.xyz_encoder, net.dir_encoder
        f = jax.jit(lambda x, d: (
            xe(x.reshape(-1, 3)),
            de(jnp.broadcast_to(d, x.shape).reshape(-1, 3))))
        dt = timed(f, (pts, dirs), 4, fence)
        emit({"probe": "encode", "pts": N_PTS, "sec": round(dt, 4)})

    if "mlp_pallas" in probes:
        from nerf_replication_tpu.ops.pallas.mlp_kernel import (
            fused_nerf_mlp, pack_nerf_params)
        packed = pack_nerf_params(params["params"]["coarse"], 63, 27)
        xe, de = net.xyz_encoder, net.dir_encoder
        pf = jax.jit(lambda x: xe(x.reshape(-1, 3)))(pts)
        vf = jax.jit(lambda d, x: de(
            jnp.broadcast_to(d, x.shape).reshape(-1, 3)))(dirs, pts)
        for tile in (512, 1024, 2048):
            f = jax.jit(lambda a, b, t=tile: fused_nerf_mlp(
                packed, a, b, tile_n=t))
            dt = timed(f, (pf, vf), 4, fence)
            emit({"probe": "mlp_pallas", "tile": tile, "pts": N_PTS,
                  "sec": round(dt, 4),
                  "tflops": round(N_PTS * FLOPS_PT / dt / 1e12, 1)})

    if "sample_pdf" in probes:
        from nerf_replication_tpu.ops.ray_ops import sample_pdf
        bins = jnp.linspace(2.0, 6.0, S - 1)[None].repeat(N_RAYS, 0)
        w = jnp.asarray(rng.uniform(0, 1, (N_RAYS, S - 2)).astype(np.float32))
        f = jax.jit(lambda b, ww: sample_pdf(b, ww, 128, key=None))
        dt = timed(f, (bins, w), 4, fence)
        emit({"probe": "sample_pdf", "rays": N_RAYS, "sec": round(dt, 4)})

    if "sort192" in probes:
        t = jnp.asarray(rng.uniform(2, 6, (N_RAYS, 192)).astype(np.float32))
        f = jax.jit(lambda x: jnp.sort(x, axis=-1))
        dt = timed(f, (t,), 4, fence)
        emit({"probe": "sort192", "rays": N_RAYS, "sec": round(dt, 4)})

    if "gather_flat" in probes:
        # raw XLA gather throughput: N_PTS random rows from a 2M x 2 table
        table = jnp.asarray(rng.normal(size=(2 ** 21, 2)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 2 ** 21, N_PTS).astype(np.int32))
        f = jax.jit(lambda tb, ix: jnp.take(tb, ix, axis=0).sum())
        dt = timed(f, (table, idx), 4, fence)
        emit({"probe": "gather_flat", "rows": N_PTS, "sec": round(dt, 4),
              "grows_per_s": round(N_PTS / dt / 1e9, 3)})

    if "hash_fwd" in probes or "hash_step" in probes:
        from nerf_replication_tpu.models.encoding.hashgrid import (
            HashGridEncoder)
        enc = HashGridEncoder(n_levels=12, n_features=2,
                              log2_hashmap_size=19, base_resolution=16,
                              finest_resolution=256)
        x_tr = jnp.asarray(
            rng.uniform(0, 1, (1024 * 112, 3)).astype(np.float32))
        ep = enc.init(jax.random.key(0), x_tr)

        if "hash_fwd" in probes:
            f = jax.jit(lambda p, x: enc.apply(p, x).sum())
            dt = timed(f, (ep, x_tr), 4, fence)
            emit({"probe": "hash_fwd", "pts": int(x_tr.shape[0]),
                  "sec": round(dt, 5),
                  "rays_per_s": round(1024 / dt, 1)})

        if "hash_step" in probes:
            g = jax.jit(jax.grad(
                lambda p, x: (enc.apply(p, x) ** 2).sum()))
            dt = timed(g, (ep, x_tr), 4, fence)
            emit({"probe": "hash_step", "pts": int(x_tr.shape[0]),
                  "sec": round(dt, 5),
                  "rays_per_s": round(1024 / dt, 1)})

    emit({"probe": "__done__"})


if __name__ == "__main__":
    main()
