#!/usr/bin/env python
"""TPU perf probes v2: pure device throughput.

Every op runs K times INSIDE one jitted program (lax.scan with a data
dependency so iterations can't collapse) and returns ONE scalar, so
neither dispatch latency nor output transfer contaminates the timing.
Separate probes measure the tunnel's transfer bandwidth and dispatch
floor explicitly.

PROBES env var selects (default all). Results -> result/perf_probe2.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "result", "perf_probe2.jsonl")
LOOP = 8


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_replication_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    sel = os.environ.get("PROBES", "all").split(",")

    def has(p):
        return "all" in sel or p in sel

    def fence_scalar(x):
        return float(np.asarray(x))

    def loop_timed(make_scalar_fn, args, label, extra=None, iters=LOOP):
        """make_scalar_fn(*args, it) -> scalar; chained via carry."""

        @jax.jit
        def run(*args):
            def body(carry, _):
                s = make_scalar_fn(*args, carry)
                return s * 1e-20, s

            c, ss = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return ss.sum()

        t0 = time.time()
        fence_scalar(run(*args))
        compile_s = time.time() - t0
        t0 = time.time()
        fence_scalar(run(*args))
        dt = (time.time() - t0) / iters
        rec = {"probe": label, "sec_per_iter": round(dt, 5),
               "compile_s": round(compile_s, 1)}
        rec.update(extra or {})
        emit(rec)
        return dt

    N_RAYS = 40000
    S = 64
    N_PTS = N_RAYS * S

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1, 1, (N_RAYS, S, 3)).astype(np.float32))
    dirs_np = rng.normal(size=(N_RAYS, 1, 3)).astype(np.float32)
    dirs_np /= np.linalg.norm(dirs_np, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs_np)

    IN, VW, W = 63, 27, 256
    MACS = (IN * W + 3 * W * W + (IN + W) * W + 2 * W * W + W * (W + 1)
            + (W + VW) * (W // 2) + (W // 2) * 3)
    FLOPS_PT = 2 * MACS

    # -- tunnel characteristics ------------------------------------------------
    if has("transfer"):
        for mb in (8, 64):
            arr = jax.jit(lambda k: jax.random.normal(
                k, (mb * 1024 * 1024 // 4,)))(jax.random.key(0))
            float(np.asarray(arr[:8]).sum())
            t0 = time.time()
            h = np.asarray(arr)
            dt = time.time() - t0
            emit({"probe": "transfer", "mb": mb, "sec": round(dt, 3),
                  "mb_per_s": round(mb / dt, 1)})

    if has("dispatch"):
        f = jax.jit(lambda x: x * 1.0000001)
        x = jnp.float32(1.0)
        x = f(x)
        fence_scalar(x)
        t0 = time.time()
        for _ in range(20):
            x = f(x)
        fence_scalar(x)
        emit({"probe": "dispatch", "sec_per_dispatch":
              round((time.time() - t0) / 20, 4)})

    # -- render components -----------------------------------------------------
    need_net = any(has(p) for p in ("mlp_xla", "mlp_pallas", "encode",
                                    "chunk_dense", "mlp_pallas_enc",
                                    "mlp_pallas_enc_t"))
    if need_net:
        from __graft_entry__ import _flagship
        cfg, net, params, settings, apply_fn = _flagship()

    if has("mlp_xla"):
        def f(params, pts, dirs, c):
            raw = apply_fn(params, pts + c, dirs, "")
            return raw.sum()

        dt = loop_timed(f, (params, pts, dirs), "mlp_xla",
                        {"pts": N_PTS, "tflops":
                         round(N_PTS * FLOPS_PT / 1e12, 2)})
        emit({"probe": "mlp_xla_tflops",
              "tflops_per_s": round(N_PTS * FLOPS_PT / dt / 1e12, 1)})

    if has("encode"):
        xe, de = net.xyz_encoder, net.dir_encoder

        def f(pts, dirs, c):
            a = xe(pts.reshape(-1, 3) + c)
            b = de(jnp.broadcast_to(dirs, pts.shape).reshape(-1, 3))
            return a.sum() + b.sum()

        loop_timed(f, (pts, dirs), "encode", {"pts": N_PTS})

    if has("mlp_pallas"):
        from nerf_replication_tpu.ops.pallas.mlp_kernel import (
            fused_nerf_mlp, pack_nerf_params)
        packed = pack_nerf_params(params["params"]["coarse"], 63, 27)
        xe, de = net.xyz_encoder, net.dir_encoder
        pf = jax.jit(lambda x: xe(x.reshape(-1, 3)))(pts)
        vf = jax.jit(lambda d, x: de(
            jnp.broadcast_to(d, x.shape).reshape(-1, 3)))(dirs, pts)
        for tile in (1024, 2048):
            def f(a, b, c, t=tile):
                return fused_nerf_mlp(packed, a + c, b, tile_n=t).sum()

            dt = loop_timed(f, (pf, vf), "mlp_pallas",
                            {"tile": tile, "pts": N_PTS})
            emit({"probe": "mlp_pallas_tflops", "tile": tile,
                  "tflops_per_s": round(N_PTS * FLOPS_PT / dt / 1e12, 1)})

    if has("mlp_pallas_enc"):
        from nerf_replication_tpu.ops.pallas.mlp_kernel import (
            fused_nerf_mlp_enc, pack_nerf_params)
        packed = pack_nerf_params(params["params"]["coarse"], 63, 27)
        p3 = pts.reshape(-1, 3)
        d3 = jnp.broadcast_to(dirs, pts.shape).reshape(-1, 3)
        for tile in (2048, 4096):
            def f(a, b, c, t=tile):
                return fused_nerf_mlp_enc(packed, a + c, b, 10, 4,
                                          tile_n=t).sum()

            dt = loop_timed(f, (p3, d3), "mlp_pallas_enc",
                            {"tile": tile, "pts": N_PTS})
            emit({"probe": "mlp_pallas_enc_tflops", "tile": tile,
                  "tflops_per_s": round(N_PTS * FLOPS_PT / dt / 1e12, 1)})

    if has("mlp_pallas_enc_t"):
        from nerf_replication_tpu.ops.pallas.mlp_kernel import (
            fused_nerf_mlp_enc_t, pack_nerf_params_t)
        packed = pack_nerf_params_t(params["params"]["coarse"], 63, 27)
        p3 = pts.reshape(-1, 3)
        d3 = jnp.broadcast_to(dirs, pts.shape).reshape(-1, 3)
        for tile in (2048, 4096):
            def f(a, b, c, t=tile):
                return fused_nerf_mlp_enc_t(packed, (a + c).T, b.T, 10, 4,
                                            tile_n=t).sum()

            dt = loop_timed(f, (p3, d3), "mlp_pallas_enc_t",
                            {"tile": tile, "pts": N_PTS})
            emit({"probe": "mlp_pallas_enc_t_tflops", "tile": tile,
                  "tflops_per_s": round(N_PTS * FLOPS_PT / dt / 1e12, 1)})

    if has("sample_pdf"):
        from nerf_replication_tpu.ops.ray_ops import sample_pdf
        bins = jnp.linspace(2.0, 6.0, S - 1)[None].repeat(N_RAYS, 0)
        w = jnp.asarray(rng.uniform(0, 1, (N_RAYS, S - 2)).astype(np.float32))

        def f(b, ww, c):
            return sample_pdf(b, ww + c, 128, key=None).sum()

        loop_timed(f, (bins, w), "sample_pdf", {"rays": N_RAYS})

    if has("sort192"):
        t = jnp.asarray(rng.uniform(2, 6, (N_RAYS, 192)).astype(np.float32))

        def f(x, c):
            return jnp.sort(x + c, axis=-1).sum()

        loop_timed(f, (t,), "sort192", {"rays": N_RAYS})

    if has("chunk_dense"):
        # a full hierarchical eval chunk (coarse+fine) as rendered in-frame
        from nerf_replication_tpu.models.nerf.renderer.volume_renderer \
            import render_rays
        import dataclasses
        s_eval = dataclasses.replace(settings, fast_sampling=False)

        def f(params, ro, rd, c):
            out = render_rays(apply_fn, params, ro.reshape(-1, 3) + c,
                              rd.reshape(-1, 3), None, s_eval, train=False)
            return out["rgb"].sum()

        ro = jnp.zeros((N_RAYS, 3)) + jnp.array([0.0, 0.0, 4.0])
        rd = dirs[:, 0, :]
        dt = loop_timed(f, (params, ro, rd), "chunk_dense",
                        {"rays": N_RAYS}, iters=4)
        emit({"probe": "chunk_dense_fps_equiv",
              "dense_800_fps": round(1.0 / (dt * 16), 3)})

    # -- hash grid ---------------------------------------------------------------
    if any(has(p) for p in ("hash_fwd", "hash_step", "hash_concat",
                            "hash_bf16")):
        from nerf_replication_tpu.models.encoding.hashgrid import (
            HashGridEncoder)
        enc = HashGridEncoder(n_levels=12, n_features=2,
                              log2_hashmap_size=19, base_resolution=16,
                              finest_resolution=256)
        NPTS = 1024 * 112
        x_tr = jnp.asarray(rng.uniform(0, 1, (NPTS, 3)).astype(np.float32))
        ep = enc.init(jax.random.key(0), x_tr)

        if has("hash_fwd"):
            def f(p, x, c):
                return enc.apply(p, x + c * 1e-9).sum()

            dt = loop_timed(f, (ep, x_tr), "hash_fwd", {"pts": NPTS})
            emit({"probe": "hash_fwd_rays", "rays_per_s": round(1024 / dt)})

        if has("hash_step"):
            def f(p, x, c):
                g = jax.grad(lambda pp: (enc.apply(pp, x + c * 1e-9) ** 2)
                             .sum())(p)
                return sum(jnp.sum(l) for l in jax.tree.leaves(g))

            dt = loop_timed(f, (ep, x_tr), "hash_step", {"pts": NPTS},
                            iters=4)
            emit({"probe": "hash_step_rays", "rays_per_s": round(1024 / dt)})

    emit({"probe": "__done__"})


if __name__ == "__main__":
    main()
