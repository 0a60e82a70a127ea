#!/usr/bin/env python
"""Per-ray autopsy of the fast-NGP vs dense error (diag_ngp_gap.py
found interior speckle + silhouette rims, sample-count-independent).

For the worst-error pixels of one view, renders each SINGLE ray four
ways and prints the composites side by side:

  A dense       — the product dense path (48 linspace + 64 CDF).
  B span-256    — 256 uniform samples inside the grid span, plain
                  deltas (isolates span restriction from selection).
  C fast-sim    — exact fast-path math (C candidates, occupied-select
                  M, gap-capped deltas, CDF F, merge).
  D fast-nocap  — C with plain uncapped deltas (isolates the cap).

Env: DIAG_CFG, DIAG_CKPT, DIAG_VIEW, DIAG_LADDER, DIAG_NPIX.
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_replication_tpu.config import default_cfg, load_cfg_tree
    from nerf_replication_tpu.datasets.nerf.blender import Dataset as BlenderDS
    from nerf_replication_tpu.models import make_network
    from nerf_replication_tpu.models.nerf.renderer.ngp_renderer import (
        _gap_capped_weights,
        make_ngp_eval_apply,
    )
    from nerf_replication_tpu.models.nerf.renderer.volume_renderer import (
        RenderSettings,
        render_rays,
    )
    from nerf_replication_tpu.ops.occupancy import (
        build_occupancy_grid,
        points_occupied,
        ray_spans,
    )
    from nerf_replication_tpu.ops.ray_ops import (
        compute_weights,
        density_activation,
        sample_pdf,
    )
    from nerf_replication_tpu.utils.ckpt_utils import load_pretrain
    from nerf_replication_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    cfg_file = os.environ.get("DIAG_CFG", "configs/nerf/hard_ngp.yaml")
    cfg = load_cfg_tree(os.path.join(ROOT, cfg_file), default_cfg())
    ckpt = os.environ.get("DIAG_CKPT",
                          os.path.join(ROOT, "data/pretrain/hard_ngp_b9"))
    params = jax.tree.map(jnp.asarray, load_pretrain(ckpt))
    rows = params["params"]["xyz_encoder"]["table"].shape[0]
    from bench import _detect_bricks, ray_grid
    cfg.network.xyz_encoder["log2_bricks"] = _detect_bricks(
        rows, cfg.network.xyz_encoder)

    ds = BlenderDS(cfg, **{**dict(cfg.test_dataset), "split": "test"})
    view = int(os.environ.get("DIAG_VIEW", "0"))
    pose = ds.poses[view]
    H, W, focal = ds.H, ds.W, float(ds.focal)

    net = make_network(cfg)
    apply_fn = make_ngp_eval_apply(net, params)
    s = dataclasses.replace(
        RenderSettings.from_cfg(cfg), ray_chunk=8000, fast_sampling=False)
    act = density_activation(s.density_activation)

    def density_fn(p, pts):
        return act(apply_fn(p, pts[:, None, :],
                            jnp.zeros((1, 1, 3)), "fine")[:, 0, 3])

    grid, bbox = build_occupancy_grid(
        density_fn, params, resolution=64, threshold=0.02, dilate=2)

    err2 = np.load(os.path.join(ROOT, "result/diag_err2.npy"))
    n_pix = int(os.environ.get("DIAG_NPIX", "6"))
    flat = np.argsort(-err2.ravel())
    # spread: take worst, then worst at least 30px away from chosen ones
    chosen = []
    for f in flat:
        y, x = divmod(int(f), W)
        if all(abs(y - cy) + abs(x - cx) > 30 for cy, cx in chosen):
            chosen.append((y, x))
        if len(chosen) >= n_pix:
            break
    # add one mid-error interior pixel (speckle class)
    mid = flat[int((err2.ravel() > 1e-3).sum() * 0.5)]
    chosen.append(divmod(int(mid), W))
    print("pixels (y, x, err2):",
          [(y, x, float(err2[y, x])) for y, x in chosen])

    ro_all, rd_all = ray_grid(H, W, focal, pose)
    idx = np.array([y * W + x for y, x in chosen])
    ro = jnp.asarray(ro_all[idx])
    rd = jnp.asarray(rd_all[idx])

    C, M, F = (int(v) for v in os.environ.get(
        "DIAG_LADDER", "32,14,12").split(","))

    # --- A: dense ----------------------------------------------------
    dense = render_rays(apply_fn, params, ro, rd, None, s, train=False)
    rgb_a = np.asarray(dense["rgb"])

    # span probe (sub=1: exact per-ray)
    r = grid.shape[0]
    cell = max((bbox[3 + d] - bbox[d]) / r for d in range(3))
    n_probe = int(np.ceil((s.far - s.near) / cell)) + 1
    t_probe = jnp.linspace(s.near, s.far, n_probe)
    step = (s.far - s.near) / (n_probe - 1)
    active, te, tx = ray_spans(ro, rd, t_probe, grid, bbox,
                               margin=2.0 * step)
    span = jnp.maximum(tx - te, 1e-3)

    # --- B: span-256 uniform, plain deltas ---------------------------
    u256 = (jnp.arange(256, dtype=jnp.float32) + 0.5) / 256
    t_b = te[:, None] + span[:, None] * u256[None, :]
    pts_b = ro[:, None] + rd[:, None] * t_b[..., None]
    raw_b = apply_fn(params, pts_b, rd[:, None], "fine")
    w_b, _, _ = compute_weights(raw_b[..., 3], t_b, activation=act,
                                finite_tail=True)
    rgb_bs = jax.nn.sigmoid(raw_b[..., :3])
    rgb_b = (w_b[..., None] * rgb_bs).sum(-2) + (
        1.0 - w_b.sum(-1)[..., None])

    # --- C/D: fast-path sim ------------------------------------------
    uu = (jnp.arange(C, dtype=jnp.float32) + 0.5) / C
    t_cand = te[:, None] + span[:, None] * uu[None, :]
    p_cand = ro[:, None] + rd[:, None] * t_cand[..., None]
    occ_c = points_occupied(p_cand, grid, bbox)
    score = jnp.where(occ_c, 0.0, 2.0) + uu[None, :] * 1e-3
    _, t_sorted = jax.lax.sort((score, t_cand), dimension=-1, num_keys=1)
    pool = jnp.maximum(occ_c.sum(-1), M)
    j = jnp.arange(M, dtype=jnp.int32)
    pos = (j[None, :] * pool[:, None]) // M
    onehot = (pos[..., None] == jnp.arange(C)[None, None]).astype(
        t_sorted.dtype)
    t_sel = jnp.einsum("cmk,ck->cm", onehot, t_sorted)
    t_c = jax.lax.sort(t_sel, dimension=-1)
    pts_c = ro[:, None] + rd[:, None] * t_c[..., None]
    raw_c = apply_fn(params, pts_c, rd[:, None], "fine")
    w_c = _gap_capped_weights(raw_c[..., 3], t_c, span, C, act)
    w_bins = 0.5 * (w_c[..., :-1] + w_c[..., 1:])
    t_f = sample_pdf(t_c, w_bins, F, key=None)
    pts_f = ro[:, None] + rd[:, None] * t_f[..., None]
    raw_f = apply_fn(params, pts_f, rd[:, None], "fine")
    t_cat = jnp.concatenate([t_c, t_f], axis=-1)
    ops = jax.lax.sort(
        (t_cat,) + tuple(
            jnp.concatenate([raw_c[..., i], raw_f[..., i]], axis=-1)
            for i in range(4)), dimension=-1, num_keys=1)
    t_all = ops[0]
    rgb_all = jax.nn.sigmoid(jnp.stack(ops[1:4], axis=-1))
    w_fast = _gap_capped_weights(ops[4], t_all, span, C, act)
    rgb_cmap = (w_fast[..., None] * rgb_all).sum(-2) + (
        1.0 - w_fast.sum(-1)[..., None])
    # D: same samples, plain deltas + finite tail
    w_noc, _, _ = compute_weights(ops[4], t_all, activation=act,
                                  finite_tail=True)
    rgb_d = (w_noc[..., None] * rgb_all).sum(-2) + (
        1.0 - w_noc.sum(-1)[..., None])

    # E: second CDF round on top of C's merged set
    F2 = int(os.environ.get("DIAG_F2", "16"))
    raw_all_s = jnp.stack(ops[1:], axis=-1)                 # (n, M+F, 4)
    w_e = _gap_capped_weights(raw_all_s[..., 3], t_all, span, C, act)
    wb_e = 0.5 * (w_e[..., :-1] + w_e[..., 1:])
    t_f2 = sample_pdf(t_all, wb_e, F2, key=None)
    pts_f2 = ro[:, None] + rd[:, None] * t_f2[..., None]
    raw_f2 = apply_fn(params, pts_f2, rd[:, None], "fine")
    t_cat2 = jnp.concatenate([t_all, t_f2], axis=-1)
    ops2 = jax.lax.sort(
        (t_cat2,) + tuple(
            jnp.concatenate([raw_all_s[..., i], raw_f2[..., i]], axis=-1)
            for i in range(4)), dimension=-1, num_keys=1)
    t_all2 = ops2[0]
    rgb_all2 = jax.nn.sigmoid(jnp.stack(ops2[1:4], axis=-1))
    w_fast2 = _gap_capped_weights(ops2[4], t_all2, span, C, act)
    rgb_e = (w_fast2[..., None] * rgb_all2).sum(-2) + (
        1.0 - w_fast2.sum(-1)[..., None])

    rgb_b, rgb_cmap, rgb_d, rgb_e = (np.asarray(v) for v in
                                     (rgb_b, rgb_cmap, rgb_d, rgb_e))
    t_all2_np = np.asarray(t_all2)
    w_fast2_np = np.asarray(w_fast2)
    t_f2_np = np.asarray(t_f2)
    t_all_np = np.asarray(t_all)
    w_fast_np = np.asarray(w_fast)
    w_b_np = np.asarray(w_b)
    t_b_np = np.asarray(t_b)
    sig_b = np.asarray(act(raw_b[..., 3]))
    for i, (y, x) in enumerate(chosen):
        print(f"\n--- pixel ({y},{x}) err2={err2[y, x]:.4f} "
              f"active={bool(active[i])} span=[{float(te[i]):.3f},"
              f"{float(tx[i]):.3f}]")
        print(f"  A dense    rgb {rgb_a[i].round(4)}")
        print(f"  B span256  rgb {rgb_b[i].round(4)}   "
              f"acc {w_b_np[i].sum():.4f}")
        print(f"  C fast     rgb {rgb_cmap[i].round(4)}   "
              f"acc {w_fast_np[i].sum():.4f}")
        print(f"  D nocap    rgb {rgb_d[i].round(4)}")
        # weight mass location comparison (B as truth)
        wb = w_b_np[i]
        top = np.argsort(-wb)[:5]
        print(f"  B top-w t: {[f'{t_b_np[i, k]:.3f}:{wb[k]:.3f}'
                               for k in sorted(top)]}")
        wf = w_fast_np[i]
        topf = np.argsort(-wf)[:5]
        print(f"  C top-w t: {[f'{t_all_np[i, k]:.3f}:{wf[k]:.3f}'
                               for k in sorted(topf)]}")
        print(f"  E 2round   rgb {rgb_e[i].round(4)}   "
              f"acc {w_fast2_np[i].sum():.4f}")
        wf2 = w_fast2_np[i]
        topf2 = np.argsort(-wf2)[:6]
        print(f"  E top-w t: {[f'{t_all2_np[i, k]:.3f}:{wf2[k]:.3f}'
                               for k in sorted(topf2)]}")
        print(f"  E f2 samples: {np.sort(t_f2_np[i]).round(3).tolist()}")
        sb = sig_b[i]
        print(f"  B sigma>0.1 t-range: "
              f"[{t_b_np[i][sb > 0.1].min() if (sb > 0.1).any() else -1:.3f},"
              f" {t_b_np[i][sb > 0.1].max() if (sb > 0.1).any() else -1:.3f}]"
              f"  max sigma {sb.max():.2f}")


if __name__ == "__main__":
    main()
