#!/usr/bin/env python
"""Convert a COLMAP reconstruction (or a raw video/image folder) into the
NeRF-synthetic ``transforms.json`` schema this framework's Blender loader
reads.

Capability parity with the reference's vendored converter
(scripts/colmap2nerf.py, 440 LoC from instant-ngp): optional ffmpeg frame
extraction, optional COLMAP SfM invocation, pose conversion
(world-to-camera -> camera-to-world, COLMAP/OpenCV -> OpenGL axes),
scene recentering/rescaling, per-frame sharpness scoring, and
``aabb_scale`` output. Fresh implementation over our own COLMAP model
reader (nerf_replication_tpu/utils/colmap/model_io.py).

Typical use:
  python scripts/colmap2nerf.py --images data/my_scene/images \
      --run_colmap --out data/my_scene/transforms.json
  python scripts/colmap2nerf.py --video in.mp4 --video_fps 2 \
      --images data/my_scene/images --run_colmap
  python scripts/colmap2nerf.py --text colmap_sparse_dir \
      --images data/my_scene/images   # reuse an existing reconstruction
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_replication_tpu.utils.colmap.model_io import (
    qvec2rotmat,
    read_model,
)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--video", default="", help="input video to extract frames")
    p.add_argument("--video_fps", type=float, default=2.0)
    p.add_argument("--images", default="images", help="image folder")
    p.add_argument("--run_colmap", action="store_true")
    p.add_argument("--colmap_matcher", default="sequential",
                   choices=["exhaustive", "sequential", "spatial",
                            "transitive", "vocab_tree"])
    p.add_argument("--colmap_db", default="colmap.db")
    p.add_argument("--text", default="colmap_text",
                   help="sparse model dir (text or binary)")
    p.add_argument("--aabb_scale", type=int, default=16,
                   help="power-of-two scene extent for the renderer AABB")
    p.add_argument("--keep_colmap_coords", action="store_true")
    p.add_argument("--out", default="transforms.json")
    p.add_argument("--skip_early", type=int, default=0)
    return p.parse_args()


def run(cmd: list[str]):
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)


def extract_frames(video: str, images: str, fps: float):
    if shutil.which("ffmpeg") is None:
        raise RuntimeError("ffmpeg not found — install it or pass --images")
    os.makedirs(images, exist_ok=True)
    run(["ffmpeg", "-i", video, "-qscale:v", "1", "-qmin", "1",
         "-vf", f"fps={fps}", os.path.join(images, "%04d.jpg")])


def run_colmap(images: str, db: str, sparse_dir: str, matcher: str):
    if shutil.which("colmap") is None:
        raise RuntimeError("colmap binary not found — run SfM elsewhere and "
                           "pass --text <sparse_dir>")
    run(["colmap", "feature_extractor", "--database_path", db,
         "--image_path", images,
         "--ImageReader.camera_model", "OPENCV",
         "--ImageReader.single_camera", "1"])
    run(["colmap", f"{matcher}_matcher", "--database_path", db])
    os.makedirs(sparse_dir, exist_ok=True)
    run(["colmap", "mapper", "--database_path", db, "--image_path", images,
         "--output_path", sparse_dir])
    run(["colmap", "model_converter", "--input_path",
         os.path.join(sparse_dir, "0"), "--output_path", sparse_dir,
         "--output_type", "TXT"])


def sharpness(path: str) -> float:
    """Variance-of-Laplacian focus measure (no cv2: numpy convolution)."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("L"), dtype=np.float32)
    lap = (-4 * img[1:-1, 1:-1] + img[:-2, 1:-1] + img[2:, 1:-1]
           + img[1:-1, :-2] + img[1:-1, 2:])
    return float(lap.var())


def closest_point_pair_center(poses: list[np.ndarray]) -> np.ndarray:
    """Central focus point: least-squares closest point to all optical
    axes (the instant-ngp recipe, reimplemented)."""
    A = []
    b = []
    for c2w in poses:
        d = c2w[:3, 2]
        o = c2w[:3, 3]
        P = np.eye(3) - np.outer(d, d)
        A.append(P)
        b.append(P @ o)
    A = np.sum(A, axis=0)
    b = np.sum(b, axis=0)
    return np.linalg.lstsq(A, b, rcond=None)[0]


def main():
    args = parse_args()
    if args.video:
        extract_frames(args.video, args.images, args.video_fps)
    if args.run_colmap:
        run_colmap(args.images, args.colmap_db, args.text,
                   args.colmap_matcher)

    cameras, images = read_model(args.text)
    if not cameras:
        raise RuntimeError(f"no cameras found in {args.text}")
    cam = next(iter(cameras.values()))

    w, h = float(cam.width), float(cam.height)
    name = cam.model
    p = cam.params
    k1 = k2 = k3 = k4 = p1 = p2 = 0.0
    is_fisheye = False
    if name == "SIMPLE_PINHOLE":
        fl_x = fl_y = p[0]; cx, cy = p[1], p[2]
    elif name == "PINHOLE":
        fl_x, fl_y, cx, cy = p[:4]
    elif name in ("SIMPLE_RADIAL", "RADIAL"):
        fl_x = fl_y = p[0]; cx, cy = p[1], p[2]
        k1 = p[3]; k2 = p[4] if name == "RADIAL" else 0.0
    elif name in ("OPENCV", "FULL_OPENCV"):
        fl_x, fl_y, cx, cy, k1, k2, p1, p2 = p[:8]
        if name == "FULL_OPENCV":
            k3, k4 = p[8], p[9]
    # fisheye models (reference scripts/colmap2nerf.py:251-269): same
    # COLMAP parameter orders, equidistant-projection distortion —
    # flagged is_fisheye so consumers undistort with the fisheye model
    elif name == "SIMPLE_RADIAL_FISHEYE":
        is_fisheye = True
        fl_x = fl_y = p[0]; cx, cy = p[1], p[2]; k1 = p[3]
    elif name == "RADIAL_FISHEYE":
        is_fisheye = True
        fl_x = fl_y = p[0]; cx, cy = p[1], p[2]; k1, k2 = p[3], p[4]
    elif name == "OPENCV_FISHEYE":
        is_fisheye = True
        fl_x, fl_y, cx, cy, k1, k2, k3, k4 = p[:8]
    else:
        raise RuntimeError(f"unsupported camera model {name}")

    angle_x = 2 * math.atan(w / (2 * fl_x))
    angle_y = 2 * math.atan(h / (2 * fl_y))

    frames = []
    poses = []
    # OpenCV -> OpenGL camera axes (flip y, z)
    flip = np.diag([1.0, -1.0, -1.0])
    for im in sorted(images.values(), key=lambda x: x.name):
        if args.skip_early and int(os.path.splitext(
                os.path.basename(im.name))[0].lstrip("0") or 0) < args.skip_early:
            continue
        R = qvec2rotmat(im.qvec)
        t = im.tvec
        w2c = np.eye(4)
        w2c[:3, :3] = R
        w2c[:3, 3] = t
        c2w = np.linalg.inv(w2c)
        c2w[:3, :3] = c2w[:3, :3] @ flip
        poses.append(c2w)
        img_path = os.path.join(args.images, im.name)
        frames.append({
            "file_path": os.path.join(
                os.path.relpath(args.images,
                                os.path.dirname(args.out) or "."),
                os.path.splitext(im.name)[0]),
            "sharpness": sharpness(img_path) if os.path.exists(img_path) else 0.0,
            "transform_matrix": c2w,
        })

    if not args.keep_colmap_coords and poses:
        center = closest_point_pair_center(poses)
        dists = [np.linalg.norm(p[:3, 3] - center) for p in poses]
        scale = 4.0 / (np.mean(dists) + 1e-8)  # cameras ~radius 4 like lego
        for fr in frames:
            fr["transform_matrix"][:3, 3] = (
                fr["transform_matrix"][:3, 3] - center) * scale

    for fr in frames:
        fr["transform_matrix"] = fr["transform_matrix"].tolist()

    out = {
        "camera_angle_x": angle_x,
        "camera_angle_y": angle_y,
        "fl_x": fl_x, "fl_y": fl_y, "cx": cx, "cy": cy, "w": w, "h": h,
        "k1": k1, "k2": k2, "k3": k3, "k4": k4, "p1": p1, "p2": p2,
        "is_fisheye": is_fisheye,
        "aabb_scale": args.aabb_scale,
        "frames": frames,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out} with {len(frames)} frames")


if __name__ == "__main__":
    main()
