#!/usr/bin/env python
"""Multi-scene evaluation sweep: run `run.py --type evaluate` semantics
over every NeRF-synthetic scene config and tabulate PSNR/SSIM/fps
(the BASELINE.json "all 8 scenes multi-scene training + eval sweep"
capability).

Usage: python scripts/eval_scenes.py [--scenes lego chair ...] [--opts k v ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ALL_SCENES = ["chair", "drums", "ficus", "hotdog", "lego", "materials",
              "mic", "ship"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenes", nargs="*", default=ALL_SCENES)
    p.add_argument("--train", action="store_true",
                   help="train each scene before evaluating")
    p.add_argument("--generate", type=int, default=0, metavar="SIZE",
                   help="generate missing scenes as procedural variants "
                        "at SIZExSIZE (offline stand-ins for the real "
                        "NeRF-synthetic data)")
    p.add_argument("--views", type=int, default=40,
                   help="train views per generated scene")
    p.add_argument("--out", default="result/scene_sweep.json")
    p.add_argument("--base_cfg", default=None,
                   help="single base config for every scene (e.g. "
                        "configs/nerf/sweep_ngp.yaml); the scene and "
                        "exp_name are passed per scene as opts instead "
                        "of one yaml per scene")
    p.add_argument("--opts", nargs="*", default=[])
    p.add_argument("--force", action="store_true",
                   help="re-run scenes already present in --out")
    args = p.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(root, args.out)

    # re-entrant: resume from a previous partial sweep (a mid-queue
    # outage keeps finished scenes; error rows are retried)
    results = {}
    if os.path.exists(out_path) and not args.force:
        try:
            with open(out_path) as f:
                results = json.load(f)
        except (OSError, json.JSONDecodeError):
            results = {}

    def save():
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=2)
        os.replace(tmp, out_path)

    for scene in args.scenes:
        prev = results.get(scene)
        if prev and not prev.get("error") and not args.force:
            print(f"skip {scene}: already swept ({prev})")
            continue
        if args.base_cfg:
            cfg = os.path.join(root, args.base_cfg)
            scene_opts = ["scene", scene, "exp_name", f"{scene}_sweep"]
        else:
            cfg = os.path.join(root, f"configs/nerf/{scene}.yaml")
            scene_opts = []
        if not os.path.exists(cfg):
            print(f"skip {scene}: no config")
            continue
        if args.generate:
            scene_dir = os.path.join(root, "data/nerf_synthetic", scene)
            if not os.path.exists(
                    os.path.join(scene_dir, "transforms_train.json")):
                sys.path.insert(0, root)
                from nerf_replication_tpu.utils.synthetic_scene import (
                    generate_scene,
                    variant_spheres,
                )
                print(f"generating variant scene {scene} "
                      f"({args.generate}px, {args.views} views)...",
                      flush=True)
                generate_scene(
                    os.path.join(root, "data/nerf_synthetic"), scene,
                    H=args.generate, W=args.generate,
                    n_train=args.views, n_val=2, n_test=4,
                    spheres=variant_spheres(scene))
        if args.train:
            tr = subprocess.run(
                [sys.executable, os.path.join(root, "train.py"),
                 "--cfg_file", cfg, *scene_opts, *args.opts],
                cwd=root, capture_output=True, text=True)
            sys.stdout.write(tr.stdout[-2000:])
            if tr.returncode != 0:
                # one scene's failure must not nuke the other scenes'
                # results
                print(f"{scene}: TRAIN FAILED rc={tr.returncode}")
                results[scene] = {"error": tr.stderr[-500:]}
                save()
                continue
        res = subprocess.run(
            [sys.executable, os.path.join(root, "run.py"), "--type",
             "evaluate", "--cfg_file", cfg, *scene_opts, *args.opts],
            cwd=root, capture_output=True, text=True)
        metrics = {}
        for line in res.stdout.splitlines():
            line = line.strip()
            if line.startswith("{") and "psnr" in line:
                try:
                    metrics = json.loads(line.replace("'", '"'))
                except json.JSONDecodeError:
                    pass
            if line.startswith("fps:"):
                metrics["fps"] = float(line.split()[-1])
        results[scene] = metrics or {"error": res.stderr[-500:]}
        print(scene, results[scene])
        save()  # atomic write after EVERY scene (outage-proof)

    save()
    print("wrote", args.out)


if __name__ == "__main__":
    main()
