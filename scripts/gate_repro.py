#!/usr/bin/env python
"""CPU reconciliation harness for the NGP honest-gate record (VERDICT
r4 item 2).

Background: ``result/bench_ngp_r3b.log`` (all ladder steps failing the
GT-drop gate by +0.8..+3.3 dB, saturating at ~+0.8 regardless of sample
count) predates the bf16 ray-direction fix (commit 275c31c, the
``precision=HIGHEST`` einsum in ngp_renderer.py) — its 34.8-35.9 dB
frame-vs-dense floor is exactly the documented "~35 dB error floor"
that fix removed, and it ran before the selection grid (78894d1), the
mid-coarse compaction (e79bc15), and the probe acceleration (498a45c)
landed. This harness provides fresh evidence that the CURRENT default
pipeline is quality-safe, without TPU access:

``python scripts/gate_repro.py probe``
    Part (a): probe-acceleration conservativeness at the full 800*800
    bench geometry. The sub-sampled probe lattice (sub=8 at 800^2) +
    stride-2 depth steps must never LOSE a truly-active ray and must
    only WIDEN spans vs the exact sub=1/stride=1 probe. Pure grid math
    (no MLP beyond the cached occupancy build) — minutes on CPU.

``python scripts/gate_repro.py gate``
    Part (b): the real bench.py GT-drop gate end-to-end at 200^2 on
    CPU (XLA-oracle field eval, NGP_EVAL_XLA=1), in two arms:
    accel ON (defaults: stride-2, selection grid, mid-coarse
    compaction, autocap) vs accel OFF (stride-1, no selection grid, no
    autocap). The arms' measured GT drops must agree within noise and
    the default arm must pass the gate.

Writes result/gate_repro_cpu.json (both parts merge into one file).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from nerf_replication_tpu.utils.compile_cache import (  # noqa: E402
    enable_compile_cache,
)

OUT = os.path.join(ROOT, "result", "gate_repro_cpu.json")


def _merge_out(part, obj):
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    try:
        with open(OUT) as f:
            cur = json.load(f)
    except (OSError, ValueError):
        cur = {}
    cur[part] = obj
    with open(OUT, "w") as f:
        json.dump(cur, f, indent=1)
    print(f"gate_repro: wrote {part} -> {OUT}")


def run_probe():
    """Part (a): accel probe (sub=8, stride=2) vs exact (1, 1)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _cache_load, _cache_path, _ckpt_mtime, ray_grid
    from nerf_replication_tpu.config import default_cfg, load_cfg_tree
    from nerf_replication_tpu.models import make_network
    from nerf_replication_tpu.models.nerf.renderer.ngp_renderer import (
        make_ngp_eval_apply,
    )
    from nerf_replication_tpu.models.nerf.renderer.volume_renderer import (
        RenderSettings,
    )
    from nerf_replication_tpu.ops.occupancy import (
        build_occupancy_grid,
        ray_spans,
    )
    from nerf_replication_tpu.ops.ray_ops import density_activation
    from nerf_replication_tpu.utils.ckpt_utils import load_pretrain
    from nerf_replication_tpu.utils.synthetic_scene import look_at_pose

    os.environ.setdefault("NGP_EVAL_XLA", "1")
    cfg = load_cfg_tree(os.path.join(ROOT, "configs/nerf/hard_ngp.yaml"),
                        default_cfg())
    ckpt = os.path.join(ROOT, "data", "pretrain", "hard_ngp_b9")
    trained = load_pretrain(ckpt)
    params = jax.tree.map(jnp.asarray, trained)
    rows = params["params"]["xyz_encoder"]["table"].shape[0]
    cfg.network.xyz_encoder["log2_bricks"] = 9
    net = make_network(cfg)
    apply_fn = make_ngp_eval_apply(net, params)
    s = RenderSettings.from_cfg(cfg)
    act = density_activation(s.density_activation)

    def density_fn(p, pts):
        return act(apply_fn(p, pts[:, None, :],
                            jnp.zeros((1, 1, 3)), "fine")[:, 0, 3])

    # same grid build as bench.run_ngp (cached when bench ran here)
    occ_res, occ_thresh = 64, 0.02
    gcache = _cache_path("occ", ckpt, _ckpt_mtime(ckpt), occ_res,
                         occ_thresh, 9)
    cached = _cache_load(gcache)
    if cached is not None:
        grid = jnp.asarray(cached["grid"])
        bbox = tuple(float(b) for b in cached["bbox"])
        print("occupancy grid: cached")
    else:
        t0 = time.time()
        grid, bbox = build_occupancy_grid(
            density_fn, params, resolution=occ_res, threshold=occ_thresh,
            dilate=2)
        print(f"occupancy grid built in {time.time() - t0:.0f}s "
              f"({float(grid.mean()):.3f} occupied)")

    # UNDILATED grid = where real mass lives. The quality criterion is
    # relative to THIS set: rays that only graze the outer dilation
    # shell composite as ~background either way; losing them is free.
    g0cache = _cache_path("occ0", ckpt, _ckpt_mtime(ckpt), occ_res,
                          occ_thresh, 9)
    cached0 = _cache_load(g0cache)
    if cached0 is not None:
        grid0 = jnp.asarray(cached0["grid"])
        print("undilated grid: cached")
    else:
        t0 = time.time()
        grid0, _ = build_occupancy_grid(
            density_fn, params, resolution=occ_res, threshold=occ_thresh,
            dilate=0)
        import numpy as _np
        from bench import _cache_save
        _cache_save(g0cache, grid=_np.asarray(grid0),
                    bbox=_np.asarray(bbox, _np.float64))
        print(f"undilated grid built in {time.time() - t0:.0f}s "
              f"({float(grid0.mean()):.3f} occupied)")

    H = W = 800
    focal = 0.5 * W / np.tan(0.5 * 0.6911112070083618)
    r = grid.shape[0]
    cell = max((bbox[3 + d] - bbox[d]) for d in range(3)) / r

    # bench gate poses: the 2 GT test views + 2 orbit poses
    poses = []
    try:
        from nerf_replication_tpu.datasets.nerf.blender import (
            Dataset as BlenderDS,
        )
        ds = BlenderDS(cfg, **{**dict(cfg.test_dataset), "split": "test"})
        poses += [np.asarray(ds.poses[i]) for i in (0, 4)]
        focal = float(ds.focal)
    except Exception as e:  # noqa: BLE001
        print(f"no test split ({e}); orbit poses only")
    poses += [look_at_pose(np.array([4.0 * np.cos(a), 4.0 * np.sin(a),
                                     1.5], np.float32))
              for a in (0.0, 2.1)]

    def spans(pose, sub, stride, g):
        """Replicates make_ngp_frame_renderer's probe stage exactly.
        margin=0 when probing the undilated mass grid (truth)."""
        n_probe = int(np.ceil((s.far - s.near) / (cell * stride))) + 1
        t_probe = jnp.linspace(s.near, s.far, n_probe)
        step = (s.far - s.near) / (n_probe - 1)
        margin = 2.0 * step if g is grid else 0.0
        ro, rd = ray_grid(H, W, focal, pose)
        ro, rd = jnp.asarray(ro), jnp.asarray(rd)
        if sub > 1:
            rd_s = rd.reshape(H, W, 3)[sub // 2::sub, sub // 2::sub]
            rd_s = rd_s.reshape(-1, 3)
            ro_s = ro.reshape(H, W, 3)[sub // 2::sub, sub // 2::sub]
            ro_s = ro_s.reshape(-1, 3)
            a, te, tx = ray_spans(ro_s, rd_s, t_probe, g, bbox,
                                  margin=margin)
            rep = lambda x: jnp.repeat(jnp.repeat(
                x.reshape(H // sub, W // sub), sub, axis=0),
                sub, axis=1).reshape(-1)
            return (np.asarray(rep(a)), np.asarray(rep(te)),
                    np.asarray(rep(tx)))
        a, te, tx = ray_spans(ro, rd, t_probe, g, bbox, margin=margin)
        return np.asarray(a), np.asarray(te), np.asarray(tx)

    report = {"H": H, "sub": 8, "stride": 2, "poses": len(poses),
              "grid_occupied": float(np.asarray(grid).mean()),
              "mass_occupied": float(np.asarray(grid0).mean()),
              "per_pose": []}
    worst_lost, worst_enter, worst_exit = 0, 0.0, 0.0
    for i, pose in enumerate(poses):
        # truth: rays that intersect REAL MASS (undilated grid, exact
        # probe, no margin) and where
        a0, te0, tx0 = spans(pose, 1, 1, grid0)
        # shipped accel probe on the dilated grid
        a8, te8, tx8 = spans(pose, 8, 2, grid)
        lost = int(np.sum(a0 & ~a8))             # mass rays dropped
        both = a0 & a8
        # accel span must CONTAIN the ray's real-mass interval
        enter_viol = float(np.maximum(te8 - te0, 0.0)[both].max()
                           ) if both.any() else 0.0
        exit_viol = float(np.maximum(tx0 - tx8, 0.0)[both].max()
                          ) if both.any() else 0.0
        row = {"pose": i, "mass_active": int(a0.sum()),
               "accel_active": int(a8.sum()), "lost_mass_rays": lost,
               "max_enter_violation": round(enter_viol, 5),
               "max_exit_violation": round(exit_viol, 5)}
        print(row)
        report["per_pose"].append(row)
        worst_lost = max(worst_lost, lost)
        worst_enter = max(worst_enter, enter_viol)
        worst_exit = max(worst_exit, exit_viol)
    report["conservative"] = bool(
        worst_lost == 0 and worst_enter <= 1e-4 and worst_exit <= 1e-4)
    report["worst"] = {"lost_mass_rays": worst_lost,
                       "enter_violation": round(worst_enter, 5),
                       "exit_violation": round(worst_exit, 5)}
    _merge_out("probe_conservative", report)
    print("PART A:", "PASS" if report["conservative"] else "FAIL",
          report["worst"])
    return 0 if report["conservative"] else 1


def run_gate():
    """Part (b): bench.py GT-drop gate at 200^2 on CPU, accel on/off."""
    scene_root = os.path.join(ROOT, "data", "synthetic_g200")
    if not os.path.isdir(os.path.join(scene_root, "hard")):
        from nerf_replication_tpu.utils.synthetic_scene import (
            generate_scene,
        )
        t0 = time.time()
        generate_scene(scene_root, "hard", H=200, W=200,
                       n_train=4, n_val=2, n_test=8, seed=0)
        print(f"generated hard@200 in {time.time() - t0:.0f}s")

    base_env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu", "BENCH_ALLOW_CPU": "1",
        "BENCH_MODEL": "ngp", "BENCH_SIZE": "200", "BENCH_FRAMES": "2",
        "BENCH_NGP_CFG": "configs/nerf/hard_ngp_g200.yaml",
        "NGP_EVAL_XLA": "1", "NGP_FUSED": "0",
        "BENCH_TIMEOUT": "3000",
    }
    arms = {
        # bench defaults: stride-2 probe, 128^3 selection grid,
        # mid-coarse compaction via autocap, probe_sub auto
        "accel_on": {},
        # conservative: exact probe, no selection grid, static caps
        "accel_off": {"BENCH_PROBE_SUB": "1", "BENCH_PROBE_STRIDE": "1",
                      "BENCH_SEL_RES": "64", "BENCH_AUTOCAP": "0"},
    }
    rows = {}
    for name, extra in arms.items():
        env = {**base_env, **extra, "BENCH_TAG": f"g200_{name}"}
        print(f"--- arm {name} ---", flush=True)
        p = subprocess.run([sys.executable, "bench.py"], cwd=ROOT,
                           env=env, capture_output=True, text=True,
                           timeout=3600)
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() \
            else "{}"
        try:
            metric = json.loads(line)
        except ValueError:
            metric = {"error": line}
        # pull the measured drop of the passing step from the log
        logp = os.path.join(ROOT, "result", f"bench_g200_{name}.log")
        drops, dense_psnr = [], None
        try:
            for ln in open(logp):
                if "dense test PSNR" in ln:
                    dense_psnr = float(ln.split("PSNR:")[1].split()[0])
                if "drop " in ln and "vs" in ln and "test " in ln:
                    d = ln.split("drop ")[1].split()[0]
                    drops.append(float(d.replace("+", "")))
        except OSError:
            pass
        rows[name] = {"metric": metric, "dense_test_psnr": dense_psnr,
                      "ladder_drops_db": drops, "rc": p.returncode}
        print(json.dumps(rows[name]))
    gate_kinds = {n: r["metric"].get("gate", {}).get("kind")
                  for n, r in rows.items()}
    on_pass = gate_kinds.get("accel_on") == "gt-drop"
    # final (passing) drop per arm, when available
    last = {n: (r["ladder_drops_db"][-1] if r["ladder_drops_db"]
                else None) for n, r in rows.items()}
    agree = (last["accel_on"] is not None
             and last["accel_off"] is not None
             and abs(last["accel_on"] - last["accel_off"]) <= 0.15)
    out = {"arms": rows, "default_arm_passes": bool(on_pass),
           "final_drops_db": last, "arms_agree_within_0p15db": bool(agree)}
    _merge_out("gate_200", out)
    print("PART B:", "PASS" if on_pass else "FAIL",
          {"drops": last, "agree": agree})
    return 0 if on_pass else 1


def main():
    enable_compile_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rc = 0
    if which in ("probe", "all"):
        rc |= run_probe()
    if which in ("gate", "all"):
        rc |= run_gate()
    sys.exit(rc)


if __name__ == "__main__":
    main()
