#!/usr/bin/env python
"""Generate a procedural NeRF-synthetic-format scene (no external data
needed). See nerf_replication_tpu.utils.synthetic_scene.

Usage: python scripts/make_synthetic_scene.py --out data/nerf_synthetic \
           --scene probe --size 200 --train 30 --val 4 --test 8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_replication_tpu.utils.synthetic_scene import generate_scene


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/nerf_synthetic")
    p.add_argument("--scene", default="probe")
    p.add_argument("--size", type=int, default=200)
    p.add_argument("--train", type=int, default=30)
    p.add_argument("--val", type=int, default=4)
    p.add_argument("--test", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    d = generate_scene(a.out, a.scene, H=a.size, W=a.size,
                       n_train=a.train, n_val=a.val, n_test=a.test, seed=a.seed)
    print("wrote", d)


if __name__ == "__main__":
    main()
